"""On-chip parity check of the Pallas folded FFT kernels.

Compares the Pallas kernels against the XLA matmul forms on the real TPU
(the interpret-mode tests only cover the CPU interpreter): computes the
max-abs difference ON DEVICE and fetches two scalars, so the remote
tunnel's fetch bandwidth is irrelevant.

Every probe failure is tracked and the script exits nonzero if any probe
failed, so automation reading the exit code sees the truth.

Usage (detached): setsid nohup python scripts/validate_c2r_tpu.py \
    > runs/validate_c2r.log 2>&1 &
Env: VAL_N (default "256,512" comma list), VAL_1024=0 / VAL_MEGA=0 to
skip sections.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the probes compare the kernels against the XLA matmul forms at MATCHED
# arithmetic; under the TPU default ("high": bf16x3 in-kernel vs 3-pass
# XLA dots, different roundings) the rel-diff is the precision gap, not a
# kernel bug -- so parity is validated at highest unless explicitly
# overridden
os.environ.setdefault("ZT_FFT_PRECISION", "highest")

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
    use_zx_folded,
    zx_folded_pallas,
)

print("devices:", jax.devices(), flush=True)
failures = []


def probe(name, fn, tol=2e-6):
    """Run fn() -> (diff, scale); record pass/fail; never raise."""
    try:
        t0 = time.time()
        d, m = (float(np.asarray(v)) for v in fn())
        rel = d / m
        ok = rel < tol
        print(
            f"{name}: rel={rel:.3e} ({time.time() - t0:.0f}s)"
            + ("" if ok else f" FAILED tol={tol:g}"),
            flush=True,
        )
        if not ok:
            failures.append(name)
        return ok
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
        failures.append(name)
        return False


for n in [int(s) for s in os.environ.get("VAL_N", "128,256,512").split(",") if s]:
    h = n // 2
    rng = np.random.default_rng(11)
    spm = jnp.asarray(rng.normal(size=(2, 2, 2, h + 1, n, n)), jnp.float32)
    assert use_c2r_pallas(spm.dtype, n), f"gate refused n={n}"

    # zx_folded vs the XLA matmul form at every gated n -- including the
    # gate's lower bound n=128, where the sub-lane-width pltpu.roll
    # butterflies lower through a Mosaic path interpret mode never
    # exercises (advisor r4 finding)
    @jax.jit
    def zxdiff(spm):
        a = zx_folded_pallas(spm, +1)
        re, im = spm[..., 0, :, :, :], spm[..., 1, :, :, :]
        for ax in (-2, -1):
            re, im = mmfft.cfft_axis(re, im, ax, +1)
        b = jnp.stack([re, im], axis=-4)
        return jnp.abs(a - b).max(), jnp.abs(b).max()

    if use_zx_folded(spm.dtype, n):
        probe(f"zx_folded_{n}", lambda spm=spm: zxdiff(spm))

    g = zx_folded_pallas(spm, +1)

    @jax.jit
    def diff(g):
        a = c2r_y_folded_pallas(g)
        b = mmfft.c2r_y_pair(g)
        return jnp.abs(a - b).max(), jnp.abs(b).max()

    probe(f"c2r_{n}", lambda g=g: diff(g))

print(("c2r on-chip parity OK" if not failures else "c2r parity FAILURES"),
      flush=True)

# -- 1024-class probes: validate the kernels the gates actually route ------
if os.environ.get("VAL_1024", "1") != "0":
    n, h = 1024, 512
    rng = np.random.default_rng(13)
    # small K: probes the per-plane VMEM footprint, not throughput.  A
    # full (2, 2, h+1, n, n) batch at 1024 is 4.3 GB and its dense XLA
    # reference OOMs the 16 GB chip (measured: 20 GB) -- the zx probes
    # need only a few ky planes, and the c2r probe (below) slices Z.
    K = 4
    spm = jnp.asarray(rng.normal(size=(1, 2, 2, K, n, n)), jnp.float32)

    # the fused single-plane kernel is PERMANENTLY gated at n <= 512: its
    # whole-plane VMEM footprint measured 122.76M at 1024 (the chip's
    # scoped limit is ~100M of 128M); the routed kernel at 1024 is
    # zx_tiled.  Assert the gate knows that.
    assert not use_zx_folded(jnp.float32, 1024), "fused gate must stop at 512"

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

    from zeldovich_tpu.ops.pallas_fft import use_zx_tiled, zx_tiled_pallas

    assert use_zx_tiled(jnp.float32, 1024), "tiled gate must cover 1024"
    probe("zx_tiled_1024", lambda: reldiff(zx_tiled_pallas(spm, +1), ref))

    # c2r at 1024: full ky extent (h+1), thin Z stripe (the kernel blocks
    # over (Z, X) anyway; the length comes from the ky axis)
    gz = jnp.asarray(rng.normal(size=(2, 2, h + 1, 64, n)), jnp.float32)

    @jax.jit
    def diff3(g):
        a = c2r_y_folded_pallas(g)
        b = mmfft.c2r_y_pair(g)
        return jnp.abs(a - b).max(), jnp.abs(b).max()

    probe("c2r_1024", lambda: diff3(gz))

    # y_tiled at 1024: the out-of-core middle-axis kernel whose lane tile
    # is VMEM-budgeted (ADVICE r3: unbudgeted it needed 149M of 128M)
    from zeldovich_tpu.ops.pallas_fft import use_y_tiled, y_tiled_pallas

    assert use_y_tiled(jnp.float32, 1024)
    zslab = jnp.asarray(rng.normal(size=(2, 2, n, 8, n)), jnp.float32)

    @jax.jit
    def diffy(zs):
        a = y_tiled_pallas(zs, +1)
        re, im = mmfft.cfft_axis(zs[..., 0, :, :, :], zs[..., 1, :, :, :],
                                 -3, +1)
        b = jnp.stack([re, im], axis=-4)
        return jnp.abs(a - b).max(), jnp.abs(b).max()

    probe("y_tiled_1024", lambda: diffy(zslab))

# -- mega kernel on-chip parity at 512 (opt-out: VAL_MEGA=0) ---------------
if os.environ.get("VAL_MEGA", "1") != "0":
    try:
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
            # ZT_MEGA_PAIR omits the (zero) y-Nyquist row
            b = b[..., : g.shape[-3], :, :]
            return jnp.abs(g - b).max(), jnp.abs(b).max()

        probe(f"mega_{ppd}", lambda: diff_mega(tables, pk_eff))
    except Exception as e:
        print(f"mega probe FAILED: {type(e).__name__}: {e}", flush=True)
        failures.append("mega_setup")

if failures:
    print("VALIDATE RESULT: FAILED:", ", ".join(failures), flush=True)
    sys.exit(1)
print("VALIDATE RESULT: all probes passed", flush=True)
