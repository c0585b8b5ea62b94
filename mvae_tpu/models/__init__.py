from mvae_tpu.models.base import MultimodalVAE


def model_ctor(family: str):
    """Family name -> model class (lazy imports keep `import
    mvae_tpu.models` light)."""
    if family == "mnist":
        from mvae_tpu.models.mnist import MnistMVAE
        return MnistMVAE
    if family == "fashionmnist":
        from mvae_tpu.models.fashionmnist import FashionMnistMVAE
        return FashionMnistMVAE
    if family == "multimnist":
        from mvae_tpu.models.multimnist import MultiMnistMVAE
        return MultiMnistMVAE
    if family == "celeba":
        from mvae_tpu.models.celeba import CelebaMVAE
        return CelebaMVAE
    if family == "celeba19":
        from mvae_tpu.models.celeba19 import Celeba19MVAE
        return Celeba19MVAE
    if family == "vision":
        from mvae_tpu.models.vision import VisionMVAE
        return VisionMVAE
    raise ValueError(f"unknown model family '{family}'")
