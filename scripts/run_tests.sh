#!/bin/sh
# Meta test harness — role parity with the reference's scripts/run_tests.sh:
# run the full suite in every dispatch configuration on one box, the way the
# reference re-runs with LIBDEFLATE_DISABLE_CPU_FEATURES to cover all its
# SIMD variants (scripts/run_tests.sh:133-165).
#
# Modes (run all by default; pass names to select):
#   quick          pytest minus the interpret-mode Pallas tests (-m 'not
#                  slow') — the fast pre-commit split (~5 min vs ~18)
#   regular        pytest on the forced 8-device CPU mesh (conftest)
#   no_native      same, with LIBDEFLATE_TPU_NO_NATIVE=1 so every host call
#                  exercises the pure-Python/NumPy paths
#   fuzz           randomized round-trip + adversarial-stream harness
#   cli_mix        gzip CLI vs system gzip in both directions
#   sanitize       native codec rebuilt with ASAN+UBSAN, fuzz + native
#                  tests run against it (role of the reference's asan/
#                  ubsan modes, scripts/run_tests.sh:262-307)
set -e
cd "$(dirname "$0")/.."
MODES="${*:-regular no_native fuzz cli_mix sanitize}"

run() { echo "== $1 =="; shift; "$@"; }

for mode in $MODES; do
  case "$mode" in
    quick)
      run quick python -m pytest tests/ -q -m "not slow"
      ;;
    regular)
      run regular python -m pytest tests/ -q
      ;;
    no_native)
      run no_native env LIBDEFLATE_TPU_NO_NATIVE=1 \
        python -m pytest tests/ -q --ignore=tests/test_native.py
      ;;
    fuzz)
      run fuzz python scripts/fuzz.py --iters 150 --device-every 50
      ;;
    sanitize)
      run sanitize sh -c '
        set -e
        g++ -O1 -g -std=c++17 -fsanitize=address,undefined \
            -fno-sanitize-recover=all -shared -fPIC \
            -o /tmp/ldtpu_sanitize.so native/ldtpu_native.cpp
        asan_rt=$(gcc -print-file-name=libasan.so)
        env LD_PRELOAD="$asan_rt" ASAN_OPTIONS=detect_leaks=0 \
            LIBDEFLATE_TPU_NATIVE_SO=/tmp/ldtpu_sanitize.so \
            python scripts/sanitize_drive.py 120
        echo "sanitize OK"
      '
      ;;
    cli_mix)
      run cli_mix sh -c '
        set -e
        tmp=$(mktemp -d)
        trap "rm -rf $tmp" EXIT
        head -c 200000 /dev/urandom > "$tmp/data"
        cp "$tmp/data" "$tmp/keep"
        # ours compresses, system gunzip reads
        python -m libdeflate_tpu.programs.gzip_cli -6 -f "$tmp/data"
        gunzip -f "$tmp/data.gz"
        cmp "$tmp/data" "$tmp/keep"
        # system gzip compresses, ours reads
        gzip -f "$tmp/data"
        python -m libdeflate_tpu.programs.gzip_cli -d -f "$tmp/data.gz"
        cmp "$tmp/data" "$tmp/keep"
        echo "cli mix OK"
      '
      ;;
    *)
      echo "unknown mode: $mode" >&2; exit 2
      ;;
  esac
done
echo "all modes passed: $MODES"
