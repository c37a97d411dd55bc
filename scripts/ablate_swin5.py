"""Round-2 Swin ablation part 5: A/B the packed-kernel grid swap +
image-grouped dispatch + in-kernel v2 cosine normalize.

Changes under test (ops/attention.py:_packed_window_attention):
  1. grid (nW-groups OUTER, image-groups INNER) so per-window bias/seg
     blocks keep their index across the inner loop (no re-fetch);
  2. Gb image grouping (dispatch no longer capped by nW's divisors —
     v2's nW=49 only divides by 7);
  3. v2 cosine q/k normalization inside the kernel (the round-2 XLA-side
     normalize cost two HBM passes over the full qkv tensor and lost,
     53.0 vs 47.6 ms).

Runs (one process, fresh jit per case):
  A. swin_v2_t b128 packed-v2 ON  (the new path)
  B. swin_v2_t b128 packed-v2 OFF (XLA fallback, round-2 baseline 47.6ms)
  C. swin_t   b128 (grid swap + Gb on the v1 packed path; prior 4674 img/s)
  D. swin_t   b128 whole-block kernel OFF (isolates packed-kernel change)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["EQXTPU_BENCH_SKIP_BASELINE"] = "1"

import bench


def main():
    print("== A. swin_v2_t, packed-v2 ON (in-kernel cosine) ==", flush=True)
    os.environ.pop("EQXVISION_TPU_SWIN_PACKED_V2", None)
    a = bench.bench_one("swin_v2_t")
    print(a, flush=True)

    print("== B. swin_v2_t, packed-v2 OFF (XLA path) ==", flush=True)
    os.environ["EQXVISION_TPU_SWIN_PACKED_V2"] = "0"
    b = bench.bench_one("swin_v2_t")
    print(b, flush=True)
    os.environ.pop("EQXVISION_TPU_SWIN_PACKED_V2", None)

    print("== C. swin_t (prior: 4674 img/s) ==", flush=True)
    c = bench.bench_one("swin_t")
    print(c, flush=True)

    print("== D. swin_t, whole-block kernel OFF ==", flush=True)
    os.environ["EQXVISION_TPU_SWIN_FUSED_BLOCK"] = "0"
    d = bench.bench_one("swin_t")
    print(d, flush=True)
    os.environ.pop("EQXVISION_TPU_SWIN_FUSED_BLOCK", None)


if __name__ == "__main__":
    main()
