"""Bounded-RAM demonstration: EDA over a 30-year full-domain memmap.

VERDICT r3 next #6 'Done' criterion: run ClimexEDA over a
(10950, 280, 280, 3) float32 stack — 10.3 GB logical, ~3.4 GB per
variable — in bounded host RAM. The stack is a SPARSE memmap (pages never
written read back as zeros without disk cost) with one real year of data
written in, so the streaming path exercises true file reads too; the
statistics stream row-/time-chunks exactly as they would over a fully
packed file (identical slicing pattern, identical peak RSS).

Prints peak RSS after each statistic. Pass a smaller T to smoke-test:

    python scripts/eda_fullscale.py [T=10950] [rows=280]
"""

from __future__ import annotations

import resource
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

from probunet_tpu.data.eda import ClimexEDA  # noqa: E402


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 10950
    h = w = int(sys.argv[2]) if len(sys.argv) > 2 else 280
    shape = (t, h, w, 3)
    logical_gb = np.prod(shape) * 4 / 1e9
    print(f"stack shape {shape} = {logical_gb:.1f} GB logical (sparse file)")

    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "climex_stack.dat"
        mm = np.memmap(path, dtype=np.float32, mode="w+", shape=shape)
        # one real year so file reads actually happen; rest stays sparse
        rng = np.random.default_rng(0)
        year = rng.standard_normal((365, h, w, 3)).astype(np.float32)
        year[..., 0] = np.abs(year[..., 0])  # pr-like: nonnegative w/ zeros
        year[..., 0][year[..., 0] < 0.5] = 0.0
        mm[:365] = year
        mm.flush()
        del mm
        ro = np.memmap(path, dtype=np.float32, mode="r", shape=shape)

        eda = ClimexEDA(ro)
        print(f"row_chunk={eda.row_chunk} time_chunk={eda.time_chunk}   "
              f"baseline RSS {rss_gb():.2f} GB")

        t0 = time.perf_counter()
        stats = eda.seasonal_stats("pr")
        print(f"seasonal_stats(pr): {time.perf_counter()-t0:6.1f} s   "
              f"peak RSS {rss_gb():.2f} GB   "
              f"DJF median mean={stats['DJF']['median'].mean():.4f}")

        t0 = time.perf_counter()
        prof = eda.doy_profile("tasmax", "rlat")
        print(f"doy_profile(tasmax): {time.perf_counter()-t0:6.1f} s   "
              f"peak RSS {rss_gb():.2f} GB   shape={prof.shape}")

        t0 = time.perf_counter()
        series = eda.interannual_seasonal_series("pr", "JJA", "q75")
        print(f"interannual(pr JJA q75): {time.perf_counter()-t0:6.1f} s   "
              f"peak RSS {rss_gb():.2f} GB   n_years={len(series)}")

        t0 = time.perf_counter()
        corr = eda.spearman_crosscorrelation("pr", (h // 2, w // 2))
        print(f"spearman_cross(pr): {time.perf_counter()-t0:6.1f} s   "
              f"peak RSS {rss_gb():.2f} GB   "
              f"corr[center]={corr[h // 2, w // 2]:.3f}")

        t0 = time.perf_counter()
        ac = eda.lagged_autocorrelation("tasmin", lags=(1,))
        print(f"lagged_autocorr(tasmin): {time.perf_counter()-t0:6.1f} s   "
              f"peak RSS {rss_gb():.2f} GB   lag1 mean={ac[1].mean():.3f}")

        peak = rss_gb()
        print(f"FINAL peak RSS {peak:.2f} GB for a {logical_gb:.1f} GB stack "
              f"({'BOUNDED' if peak < logical_gb / 2 else 'NOT bounded'})")


if __name__ == "__main__":
    main()
