#!/usr/bin/env bash
# Build + test + bench driver — analog of the reference's run.sh (clean ->
# build -> CUDA_LAUNCH_BLOCKING test, reference: run.sh:33-92).  Here:
# build the native runtime, run the hermetic CPU suite, then (with --tpu)
# the hardware oracle sweep and the headline benchmark.
set -euo pipefail
cd "$(dirname "$0")"

RUN_TPU=0
QUICK=""
for arg in "$@"; do
  case "$arg" in
    --tpu) RUN_TPU=1 ;;
    --quick) QUICK="--quick" ;;
    --clean) make -C csrc clean ;;
    *) echo "usage: $0 [--clean] [--tpu] [--quick]"; exit 2 ;;
  esac
done

echo "== native runtime =="
make -C csrc

echo "== hermetic CPU suite (Pallas interpret + virtual 8-device mesh) =="
if [[ -n "$QUICK" ]]; then
  # quick tier (~5 min): everything but the >30s engine/ring e2e tests.
  # The FULL suite (below, default) is the gate — the quick tier exists so
  # a pre-snapshot check is cheap enough to actually run (VERDICT r3 #1).
  python -m pytest tests/ -x -q -m "not slow"
else
  python -m pytest tests/ -x -q
fi

echo "== multi-process dryrun (jax.distributed + DCN-aware hybrid mesh) =="
python benchmarks/dryrun_multiprocess.py --procs 2 --local-devices 4

echo "== ring ICI-overlap schedule check (AOT v5e 2x4) =="
python benchmarks/check_ring_overlap.py

if [[ "$RUN_TPU" == "1" ]]; then
  echo "== hardware oracle sweep (dense) =="
  python benchmarks/sweep_dense.py $QUICK
  echo "== hardware oracle sweep (varlen) =="
  python benchmarks/sweep_varlen.py $QUICK
  echo "== hardware oracle sweep (kvcache decode) =="
  python benchmarks/sweep_decode.py $QUICK
  echo "== randomized differential fuzz (unaligned/ragged edge cases) =="
  if [[ -n "$QUICK" ]]; then
    python benchmarks/fuzz_oracle.py 12
  else
    python benchmarks/fuzz_oracle.py 40
  fi
  echo "== headline benchmark =="
  python bench.py
fi
