"""Benchmark: end-to-end IC generation throughput on the available device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpart/sec", "vs_baseline": N}

The measured step is the full device pipeline -- fused Hermitian mode
synthesis from the pcg64 stream + unnormalized inverse 3-D FFT of the two
packed complex arrays -- i.e. everything the reference spends its runtime
on (ZeldovichZ + BlockArray IO + ZeldovichXY), minus host serialization
(which streams overlapped with compute at scale).

Baseline: the reference publishes no wall-clock numbers (BASELINE.md); the
project north star is 4096^3 in < 5 min on a v4-64 slice, i.e.
4096^3 / 300 s / 64 chips = 3.58 Mpart/sec/chip.  vs_baseline is measured
per-chip throughput divided by that target rate, so 1.0 == on target.

Env knobs: BENCH_PPD (default 256), BENCH_DTYPE (float32|float64,
default float32 -- the TPU fast path), BENCH_REPS (default 3).
"""

import json
import os
import sys
import time


def main():
    ppd = int(os.environ.get("BENCH_PPD", "256"))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    reps = int(os.environ.get("BENCH_REPS", "3"))

    import jax

    jax.config.update("jax_enable_x64", True)  # u64 RNG limbs
    import jax.numpy as jnp

    from pathlib import Path

    from zeldovich_tpu.models.pipeline import _ifft_all
    from zeldovich_tpu.ops.modes import synthesize_slab
    from zeldovich_tpu.utils.params import Parameters
    from zeldovich_tpu.models.pipeline import Zeldovich

    assets = Path(__file__).parent / "zeldovich_tpu" / "assets"
    param = Parameters.from_dict(
        dict(
            BoxSize=720.0,
            NP=ppd**3,
            CPD=ppd,
            ICFormat="RVZel",
            InitialConditionsDirectory="/tmp/bench_ic",
            InitialRedshift=49.0,
            ZD_Seed=12346,
            ZD_NumBlock=2,
            ZD_Pk_scale=1.0,
            ZD_Pk_norm=8.0,
            ZD_Pk_sigma=0.0210839935761,
            ZD_Pk_smooth=0.0,
            ZD_Pk_filename=str(assets / "wmap1new.pow"),
            ZD_Version=2,
        )
    )
    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
    model = Zeldovich(param, dtype=dtype)
    cfg = model.cfg

    @jax.jit
    def step(tables):
        k = synthesize_slab(0, cfg.ppd, cfg, tables, dtype=dtype)
        return _ifft_all(k)

    n_dev = 1  # single-chip bench; the sharded path is exercised in tests
    out = step(model.tables)
    out.block_until_ready()  # compile + warm-up

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(model.tables)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    mpart_per_sec = param.np / 1e6 / dt
    target_per_chip = 4096**3 / 300.0 / 64 / 1e6  # 3.58 Mpart/sec/chip
    result = {
        "metric": f"IC generation throughput ({ppd}^3, {dtype_name}, "
        f"synthesis+iFFT, {jax.devices()[0].platform})",
        "value": round(mpart_per_sec, 3),
        "unit": "Mpart/sec",
        "vs_baseline": round(mpart_per_sec / (n_dev * target_per_chip), 3),
    }
    print(json.dumps(result))
    print(
        f"# {ppd}^3 in {dt:.3f} s best-of-{reps} on {jax.devices()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
