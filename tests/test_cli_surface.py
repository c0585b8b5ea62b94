"""CLI flag-surface parity: every reference flag exists with the
reference's default on the same-named script here.

Reference surfaces (verbatim from the argparse blocks):
  mnist/train.py:132-154, fashionmnist/train.py:132-154,
  multimnist/train.py:141-162, celeba/train.py:118-139,
  celeba19/train.py:180-203, vision/train.py:111-128,
  mnist/sample.py:52-63 (fashionmnist/multimnist isomorphic),
  celeba/sample.py:66-78, vision/sample.py:28-37,
  multimnist/datasets.py:294-311, vision/setup.py:151-156.

The parsers are captured from the REAL shipped `main()`s (parse_args is
intercepted), so a flag dropped from an experiment script — not just
from utils/cli.py — fails here.
"""

import argparse
import importlib

import pytest


class _Captured(Exception):
    def __init__(self, parser):
        self.parser = parser


@pytest.fixture
def grab_parser(monkeypatch):
    def grab(module_name):
        mod = importlib.import_module(module_name)

        def fake_parse(self, argv=None, ns=None):
            raise _Captured(self)

        monkeypatch.setattr(argparse.ArgumentParser, "parse_args",
                            fake_parse)
        try:
            mod.main([])
        except _Captured as c:
            return c.parser
        raise AssertionError(f"{module_name}.main never parsed args")

    return grab


def _surface(parser):
    """{dest: (option_strings, default)} for every non-help action."""
    return {a.dest: (tuple(a.option_strings), a.default)
            for a in parser._actions
            if not isinstance(a, argparse._HelpAction)}


TRAIN_COMMON = {
    "n_latents": "--n-latents", "batch_size": "--batch-size",
    "epochs": "--epochs", "annealing_epochs": "--annealing-epochs",
    "lr": "--lr", "log_interval": "--log-interval", "cuda": "--cuda",
}

# family -> (reference defaults for the reference flags)
TRAIN_REF = {
    "mnist": dict(n_latents=64, batch_size=100, epochs=500,
                  annealing_epochs=200, lr=1e-3, log_interval=10,
                  lambda_image=1.0, lambda_text=10.0, cuda=False),
    "fashionmnist": dict(n_latents=64, batch_size=100, epochs=500,
                         annealing_epochs=200, lr=1e-3, log_interval=10,
                         lambda_image=1.0, lambda_text=10.0, cuda=False),
    "multimnist": dict(n_latents=64, batch_size=100, epochs=500,
                       annealing_epochs=200, lr=1e-3, log_interval=10,
                       lambda_image=1.0, lambda_text=10.0, cuda=False),
    "celeba": dict(n_latents=100, batch_size=100, epochs=100,
                   annealing_epochs=20, lr=1e-4, log_interval=10,
                   lambda_image=1.0, lambda_attrs=10.0, cuda=False),
    "celeba19": dict(n_latents=100, batch_size=100, epochs=100,
                     annealing_epochs=20, lr=1e-4, log_interval=10,
                     approx_m=1, lambda_image=1.0, lambda_attrs=10.0,
                     cuda=False),
    "vision": dict(n_latents=250, batch_size=50, epochs=100,
                   annealing_epochs=20, lr=1e-4, log_interval=10,
                   cuda=False),
}


@pytest.mark.parametrize("family", sorted(TRAIN_REF))
def test_train_surface(grab_parser, family):
    surf = _surface(grab_parser(f"experiments.{family}.train"))
    for dest, ref_default in TRAIN_REF[family].items():
        assert dest in surf, f"{family} train.py lost --{dest}"
        opts, default = surf[dest]
        flag = "--" + dest.replace("_", "-")
        assert flag in opts, f"{family}: {dest} spelled {opts}, not {flag}"
        assert default == ref_default, (
            f"{family} --{dest}: default {default} != reference "
            f"{ref_default}")
    # our additions must not shadow/rename any reference flag
    for extra in ("resume", "seed", "data_dir", "out_dir", "profile_dir",
                  "bf16", "no_device_data", "exact_decode", "download"):
        assert extra in surf, f"{family} train.py lost our --{extra}"


SAMPLE_REF = {
    "mnist": {"n_samples": 64, "condition_on_image": None,
              "condition_on_text": None, "cuda": False},
    "fashionmnist": {"n_samples": 64, "condition_on_image": None,
                     "condition_on_text": None, "cuda": False},
    "multimnist": {"n_samples": 64, "condition_on_image": None,
                   "condition_on_text": None, "cuda": False},
    # celeba/train.py uses --lambda-attrs but celeba/sample.py reads
    # --condition-on-text (the reference mismatch); we accept BOTH
    "celeba": {"n_samples": 64, "condition_on_image": None,
               "condition_on_attrs": None, "condition_on_text": None,
               "cuda": False},
    # the reference shipped no celeba19/sample.py; ours mirrors celeba's
    "celeba19": {"n_samples": 64, "condition_on_image": None,
                 "condition_on_attrs": None, "cuda": False},
    # condition_type defaults to "image" here (reference: None) — inert
    # unless --condition-file is given, where the reference requires both
    "vision": {"n_samples": 1, "condition_file": None,
               "condition_type": "image", "cuda": False},
}


@pytest.mark.parametrize("family", sorted(SAMPLE_REF))
def test_sample_surface(grab_parser, family):
    surf = _surface(grab_parser(f"experiments.{family}.sample"))
    assert "model_path" in surf, f"{family} sample.py lost model_path"
    for dest, ref_default in SAMPLE_REF[family].items():
        assert dest in surf, f"{family} sample.py lost --{dest}"
        _opts, default = surf[dest]
        assert default == ref_default, (
            f"{family} sample --{dest}: default {default} != "
            f"reference {ref_default}")


def test_multimnist_datasets_surface(grab_parser):
    surf = _surface(grab_parser("experiments.multimnist.datasets"))
    ref = dict(min_digits=0, max_digits=4, no_resize=False,
               no_translate=False, fixed=False, scramble=False,
               reverse=False, no_repeat=False)
    for dest, ref_default in ref.items():
        assert dest in surf, f"multimnist datasets.py lost --{dest}"
        assert surf[dest][1] == ref_default


def test_vision_setup_surface(grab_parser):
    surf = _surface(grab_parser("experiments.vision.setup"))
    for dest in ("type", "in_dir", "out_dir"):
        assert dest in surf, f"vision setup.py lost positional {dest}"


def test_loglike_surface(grab_parser):
    # no reference analog (promised, never shipped) — pin OUR contract
    for family in sorted(TRAIN_REF):
        surf = _surface(grab_parser(f"experiments.{family}.loglike"))
        for dest in ("model_path", "n_samples", "batch_size",
                     "max_examples", "target", "seed"):
            assert dest in surf, f"{family} loglike.py lost --{dest}"
