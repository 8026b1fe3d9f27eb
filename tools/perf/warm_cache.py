"""Populate the persistent XLA compile cache (.jax_cache/) with every
program the driver bench (bench.py) compiles, MOST EXPENSIVE FIRST.

Why this exists: the compile cache is machine-local and gitignored, so a
fresh environment starts cold — bench.py cold is ~65 min on this box,
while the driver's BENCH_BUDGET_S is 1500 s, which would budget-skip the
SAM/SAM2/loader keys (the exact keys VERDICT r4 demanded). Running this
script once makes the subsequent bench.py run warm (<15 min) and lose
nothing to the budget. Ordering is reversed vs bench.py (sam2 first):
if THIS run is cut short, the programs most likely to be cut by the
driver's budget are the ones already cached.

Usage: python tools/perf/warm_cache.py  (safe to interrupt/re-run)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import bench  # noqa: E402


def main():
    bench._enable_compile_cache()
    steps = [
        ("sam2_train", bench.bench_sam2_train_detail),
        ("sam_train", bench.bench_sam_train_detail),
        ("vit_train", bench.bench_vit_train),
        ("vit", bench.bench_vit),
        ("retinanet", bench.bench_retinanet),
        ("vit_int8", bench.bench_vit_int8),
        ("retinanet_int8", bench.bench_retinanet_int8),
        ("train_through_loader", bench.bench_vit_train_through_loader),
    ]
    t0 = time.perf_counter()
    for name, fn in steps:
        t = time.perf_counter()
        print(f"warm {name} start (t={t - t0:.0f}s)", flush=True)
        try:
            out = fn()
        except Exception as e:
            print(f"warm {name} FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"warm {name} done in {time.perf_counter() - t:.1f}s: {out}",
              flush=True)
    print(f"warm_cache total {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
