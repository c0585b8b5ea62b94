#!/bin/bash
# Round-4 TPU measurement batch (VERDICT r3 items 1, 2, 4, 10).
# Each config is a FRESH process: every experiment env var is read at
# trace time (BASELINE.md "grouped-term-loss" note), so in-process flips
# with a warm compilation cache silently do nothing.
# Run on the quiet host:  bash scripts/r4_ab_batch.sh | tee /tmp/r4_ab.log
set -u
cd "$(dirname "$0")/.."
K=${K:-100}

run() {  # run <tag> <env...> -- <families> [extra args]
    local tag=$1; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    echo "=== $tag (k=$K, $*) ==="
    env "${envs[@]}" python scripts/bench_families.py --k "$K" --families "$@"
}

# --- VERDICT #4: full 12-row refresh under shipped defaults ------------
echo "### bench_families refresh (shipped defaults) $(date -u +%F)"
python scripts/bench_families.py --k "$K"
python scripts/bench_families.py --k "$K" --bf16

# --- VERDICT #1a: grouped-term-loss A/B on vision + multimnist ---------
run grouped=0 MVAE_GROUPED_TERM_LOSS=0 -- vision,multimnist --bf16
run grouped=1 MVAE_GROUPED_TERM_LOSS=1 -- vision,multimnist --bf16

# --- VERDICT #2: Pallas fused conv+BN-moments epilogue -----------------
run convbn=1 MVAE_CONVBN_PALLAS=1 -- celeba,multimnist,vision --bf16
run convbn=1-f32 MVAE_CONVBN_PALLAS=1 -- celeba

# --- VERDICT #10: int8-resident -> bf16 in-step decode -----------------
run decode_bf16=1 MVAE_DECODE_BF16=1 -- celeba,vision --bf16

echo "### done $(date -u +%F_%T)"
