"""Window-DP throughput: native C DW_banded batch vs Pallas banded-NW,
end-to-end (inputs on host -> alignment rows on host), matching the round-2
design-study conditions (2048 windows, 800-1000bp, 5-25% divergence).

Run on the TPU rig:  python bench_window_dp.py [n_windows]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
rng = np.random.default_rng(0)


def mutate(q, d):
    out = []
    for b in q:
        r = rng.random()
        if r < d * 0.4:
            continue  # deletion
        if r < d * 0.7:
            out.append(rng.integers(0, 4))  # substitution
            continue
        out.append(b)
        if rng.random() < d * 0.3:
            out.append(rng.integers(0, 4))  # insertion
    return np.array(out, np.uint8)


qs, ts = [], []
for _ in range(N):
    L = int(rng.integers(800, 1000))
    q = rng.integers(0, 4, L).astype(np.uint8)
    qs.append(q)
    ts.append(mutate(q, float(rng.uniform(0.05, 0.25))))

print(f"{N} windows, backend={jax.default_backend()}", flush=True)

from hinge_tpu.ops import myers as MY  # noqa: E402

t0 = time.perf_counter()
rows_c = MY.align_exact_batch(qs, ts, 1500)
t_c = time.perf_counter() - t0
ed_c = sum(int((a != b).sum()) for a, b in rows_c)
print(f"native C DW_banded: {N / t_c:8.0f} win/s  ({t_c:.2f}s, edits {ed_c})",
      flush=True)

from hinge_tpu.ops.pallas_band_nw import band_align_batch  # noqa: E402

for tag in ("compile+run", "warm"):
    t0 = time.perf_counter()
    rows_p = band_align_batch(qs, ts)
    t_p = time.perf_counter() - t0
    ed_p = sum(int((a != b).sum()) for a, b in rows_p)
    print(f"pallas band-NW ({tag}): {N / t_p:8.0f} win/s  "
          f"({t_p:.2f}s, edits {ed_p})", flush=True)
print(f"speedup warm: {t_c / t_p:.2f}x; edit ratio {ed_p / max(ed_c,1):.3f}")
