"""On-chip parity check of the Pallas folded c2r y-transform.

Compares c2r_y_folded_pallas against the XLA c2r_y_pair on the real TPU
(the interpret-mode tests only cover the CPU interpreter): computes the
max-abs difference ON DEVICE and fetches two scalars, so the remote
tunnel's fetch bandwidth is irrelevant.

Usage (detached): setsid nohup python scripts/validate_c2r_tpu.py \
    > runs/validate_c2r.log 2>&1 &
Env: VAL_N (default "256,512" comma list).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)
from zeldovich_tpu.utils.backend import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from zeldovich_tpu.ops import mmfft
from zeldovich_tpu.ops.pallas_fft import (
    c2r_y_folded_pallas,
    use_c2r_pallas,
    zx_folded_pallas,
)

print("devices:", jax.devices(), flush=True)

for n in [int(s) for s in os.environ.get("VAL_N", "256,512").split(",") if s]:
    h = n // 2
    rng = np.random.default_rng(11)
    spm = jnp.asarray(
        rng.normal(size=(2, 2, 2, h + 1, n, n)), jnp.float32
    )
    assert use_c2r_pallas(spm.dtype, n), f"gate refused n={n}"
    t0 = time.time()
    g = zx_folded_pallas(spm, +1)

    @jax.jit
    def diff(g):
        a = c2r_y_folded_pallas(g)
        b = mmfft.c2r_y_pair(g)
        return jnp.abs(a - b).max(), jnp.abs(b).max()

    d, m = (float(np.asarray(v)) for v in diff(g))
    rel = d / m
    print(
        f"n={n}: max|pallas-xla|={d:.3e} max|xla|={m:.3e} rel={rel:.3e} "
        f"({time.time() - t0:.0f}s incl. compile)",
        flush=True,
    )
    assert rel < 2e-6, f"c2r parity FAILED at n={n}"

print("c2r on-chip parity OK", flush=True)

# -- n=1024 VMEM feasibility probe (gates stop at 512 until this passes) --
if os.environ.get("VAL_1024", "1") != "0":
    n, h = 1024, 512
    rng = np.random.default_rng(13)
    # small K: probes the per-plane VMEM footprint, not throughput.  A
    # full (2, 2, h+1, n, n) batch at 1024 is 4.3 GB and its dense XLA
    # reference OOMs the 16 GB chip (measured: 20 GB) -- the zx probes
    # need only a few ky planes, and the c2r probe (below) slices Z.
    K = 4
    spm = jnp.asarray(rng.normal(size=(1, 2, 2, K, n, n)), jnp.float32)

    @jax.jit
    def xla_zx(spm):
        re, im = spm[..., 0, :, :, :], spm[..., 1, :, :, :]
        for ax in (-2, -1):
            re, im = mmfft.cfft_axis(re, im, ax, +1)
        return jnp.stack([re, im], axis=-4)

    @jax.jit
    def reldiff(a, b):
        return jnp.abs(a - b).max(), jnp.abs(b).max()

    t0 = time.time()
    ref = xla_zx(spm)
    print(f"xla ref n=1024 compiled ({time.time() - t0:.0f}s)", flush=True)

    def probe(name, fn):
        try:
            t0 = time.time()
            d, m = (float(np.asarray(v)) for v in reldiff(fn(), ref))
            print(
                f"{name} n=1024: rel={d / m:.3e} ({time.time() - t0:.0f}s)",
                flush=True,
            )
            return True
        except Exception as e:
            print(f"{name} n=1024 FAILED: {type(e).__name__}: {e}", flush=True)
            return False

    from zeldovich_tpu.ops.pallas_fft import zx_tiled_pallas

    probe("zx_fused", lambda: zx_folded_pallas(spm, +1))
    probe("zx_tiled", lambda: zx_tiled_pallas(spm, +1))

    # c2r VMEM probe at 1024: needs the full ky extent (h+1) but only a
    # thin Z stripe -- the kernel blocks over (Z, X) anyway
    gz = jnp.asarray(
        rng.normal(size=(2, 2, h + 1, 64, n)), jnp.float32
    )
    t0 = time.time()

    @jax.jit
    def diff3(g):
        a = c2r_y_folded_pallas(g)
        b = mmfft.c2r_y_pair(g)
        return jnp.abs(a - b).max(), jnp.abs(b).max()

    try:
        d, m = (float(np.asarray(v)) for v in diff3(gz))
        print(
            f"c2r n=1024: rel={d / m:.3e} ({time.time() - t0:.0f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"c2r n=1024 FAILED: {type(e).__name__}: {e}", flush=True)

# -- mega kernel on-chip parity at 512 (opt-out: VAL_MEGA=0) ---------------
if os.environ.get("VAL_MEGA", "1") != "0":
    try:
        import jax.numpy as jnp

        from zeldovich_tpu.models.pipeline import Zeldovich
        from zeldovich_tpu.ops.modes_real import synthesize_half_pair
        from zeldovich_tpu.ops.pallas_synth import halfspace_pack_zx_pallas
        from zeldovich_tpu.utils.params import Parameters

        assets = Path(__file__).parent.parent / "zeldovich_tpu" / "assets"
        ppd = int(os.environ.get("VAL_MEGA_PPD", "512"))
        param = Parameters.from_dict(
            dict(
                BoxSize=720.0, NP=ppd**3, CPD=ppd, ICFormat="RVZel",
                InitialConditionsDirectory="/tmp/val_mega",
                InitialRedshift=49.0, ZD_Seed=12346, ZD_NumBlock=2,
                ZD_Pk_scale=1.0, ZD_Pk_norm=8.0,
                ZD_Pk_sigma=0.0210839935761, ZD_Pk_smooth=0.0,
                ZD_Pk_filename=str(assets / "wmap1new.pow"), ZD_Version=2,
            )
        )
        model = Zeldovich(param, dtype=jnp.float32)
        cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff

        @jax.jit
        def diff_mega(tables, pk_eff):
            g = halfspace_pack_zx_pallas(
                cfg, tables.planes, tables.mzx, tables.czx, pk_eff,
                fixed_power=cfg.fixed_power, just_density=cfg.just_density,
            )
            spm = synthesize_half_pair(
                cfg, tables, dtype=jnp.float32, pk_eff=pk_eff
            )
            re, im = spm[..., 0, :, :, :], spm[..., 1, :, :, :]
            for ax in (-2, -1):
                re, im = mmfft.cfft_axis(re, im, ax, +1)
            b = jnp.stack([re, im], axis=-4)
            return jnp.abs(g - b).max(), jnp.abs(b).max()

        t0 = time.time()
        d, m = (float(np.asarray(v)) for v in diff_mega(tables, pk_eff))
        print(
            f"mega {ppd}: rel={d / m:.3e} ({time.time() - t0:.0f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"mega probe FAILED: {type(e).__name__}: {e}", flush=True)
