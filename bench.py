"""Benchmark: end-to-end IC generation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpart/sec", "vs_baseline": N}

The measured step is the full device pipeline -- fused Hermitian mode
synthesis from the pcg64 stream + unnormalized inverse 3-D FFT of the
packed complex arrays -- i.e. everything the reference spends its runtime
on (ZeldovichZ + BlockArray IO + ZeldovichXY), minus host serialization
(which streams overlapped with compute at scale).

Baseline: the reference publishes no wall-clock numbers (BASELINE.md); the
project north star is 4096^3 in < 5 min on a v4-64 slice, i.e.
4096^3 / 300 s / 64 chips = 3.58 Mpart/sec/chip.  vs_baseline is measured
per-chip throughput divided by that target rate, so 1.0 == on target.

The measurement runs in a subprocess with a timeout; if the accelerator
runtime is unreachable (e.g. a wedged device tunnel), it falls back to the
CPU backend rather than hanging, and labels the metric accordingly.

Env knobs: BENCH_PPD (default 512), BENCH_DTYPE (float32|float64, default
float32 -- the TPU fast path), BENCH_REPS (default 3), BENCH_TIMEOUT
(seconds per attempt, default 1500).
"""

import json
import os
import subprocess
import sys
import time


def child():
    ppd = int(os.environ.get("BENCH_PPD", "512"))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    reps = int(os.environ.get("BENCH_REPS", "6"))

    import jax

    jax.config.update("jax_enable_x64", True)  # u64 RNG limbs
    import jax.numpy as jnp

    from pathlib import Path

    from zeldovich_tpu.models.pipeline import Zeldovich
    from zeldovich_tpu.utils.params import Parameters

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

    # complex-free path: real-pair synthesis + matmul (MXU) FFT -- works on
    # every backend and is the TPU-native formulation.  The static
    # amplitude field (pk_eff) is setup work, passed by argument so it is
    # not baked into the program as a constant.
    step = model.xspace_pair

    import numpy as np

    def run_and_fetch():
        out = step()
        return np.asarray(out[0, 0, :2, :2, :2])  # forces completion

    probe = run_and_fetch()  # compile + warm-up
    assert np.all(np.isfinite(probe)), "non-finite output"
    assert float(np.abs(probe).mean()) >= 0, "fetch failed"

    # Timings must be fetch-bracketed: on some remote backends
    # block_until_ready returns early, so per-step time is derived from the
    # delta between an N-step chain and a 1-step chain (device executions
    # serialize, the final fetch drains the queue).
    t0 = time.perf_counter()
    run_and_fetch()
    t_one = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(reps):
        out = step()
    np.asarray(out[0, 0, 0, 0, :4])
    t_chain = time.perf_counter() - t0
    dt = max((t_chain - t_one) / (reps - 1), 1e-9) if reps > 1 else t_chain

    platform = jax.devices()[0].platform
    print(
        json.dumps(
            {
                "ppd": ppd,
                "dtype": dtype_name,
                "seconds": dt,
                "mpart_per_sec": param.np / 1e6 / dt,
                "platform": platform,
                "device": str(jax.devices()[0]),
            }
        )
    )


def main():
    timeout = int(os.environ.get("BENCH_TIMEOUT", "1500"))
    attempts = [dict(os.environ)]
    # fallback: CPU backend (also skip any accelerator plugin registration)
    cpu_env = dict(os.environ)
    cpu_env.update(
        JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="", BENCH_FALLBACK="cpu"
    )
    attempts.append(cpu_env)

    result = None
    for env in attempts:
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child"],
                env=env,
                capture_output=True,
                text=True,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            print(
                f"# bench attempt timed out after {timeout}s "
                f"(platform env JAX_PLATFORMS={env.get('JAX_PLATFORMS')})",
                file=sys.stderr,
            )
            continue
        for line in proc.stdout.splitlines():
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "mpart_per_sec" in cand:
                result = cand
                break
        if result:
            break
        print(proc.stderr[-2000:], file=sys.stderr)

    if not result:
        print(
            json.dumps(
                {
                    "metric": "IC generation throughput (device unreachable)",
                    "value": 0.0,
                    "unit": "Mpart/sec",
                    "vs_baseline": 0.0,
                }
            )
        )
        return 1

    target_per_chip = 4096**3 / 300.0 / 64 / 1e6  # 3.58 Mpart/sec/chip
    mps = result["mpart_per_sec"]
    print(
        json.dumps(
            {
                "metric": (
                    f"IC generation throughput ({result['ppd']}^3, "
                    f"{result['dtype']}, synthesis+iFFT, {result['platform']})"
                ),
                "value": round(mps, 3),
                "unit": "Mpart/sec",
                "vs_baseline": round(mps / target_per_chip, 3),
            }
        )
    )
    print(
        f"# {result['ppd']}^3 in {result['seconds']:.3f} s on "
        f"{result['device']}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        sys.exit(main())
