"""Client-side Mosaic lowering sweep of every TPU kernel route.

``jax.jit(f).lower(ShapeDtypeStruct)`` runs Pallas->Mosaic lowering —
including the block-shape legality checks — entirely on the client, with
no device data and no remote compile.  Through the slow axon tunnel this
turns a 10-minute compile-and-crash loop into a seconds-long static
check; run it after ANY kernel or BlockSpec change, before burning a
real compile.  bench.py runs this sweep as a gate before recording any
perf number.

CAVEAT: lowering validates block-shape legality but NOT VMEM fit --
scoped-vmem OOM only surfaces at real compile.  The kernels therefore
budget their tile sizes against pallas_fft._VMEM_WINDOW_BUDGET at trace
time (see the y_tiled/c2r sizing loops).

Covers the standalone kernels at every gated production shape plus the
fused product steps (half-spectrum forward with and without the mega
route) at 512^3.  Exit code 1 if anything fails to lower.

Usage: python scripts/lower_check.py   (needs the TPU backend visible,
       i.e. the default axon env; lowering itself stays local)
"""

import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

S = jax.ShapeDtypeStruct
f32 = jnp.float32
failures = []


def check(name, fn, *specs):
    try:
        jax.jit(fn).lower(*specs)
        print(f"{name}: lower-ok", flush=True)
    except Exception as e:
        failures.append(name)
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    from zeldovich_tpu.ops.pallas_fft import (
        c2r_y_folded_pallas,
        y_tiled_pallas,
        zx_folded_pallas,
        zx_tiled_pallas,
    )

    for n in (128, 256, 512):  # fused-kernel gate range
        h = n // 2
        check(
            f"c2r_{n}", partial(c2r_y_folded_pallas, interpret=False),
            S((2, 2, 2, h + 1, n, n), f32),
        )
        check(
            f"zx_folded_{n}", partial(zx_folded_pallas, sign=1, interpret=False),
            S((2, 2, h + 1, n, n), f32),
        )
    # c2r at its widened 1024 gate (Z-sliced stripe: the OOC block shape)
    check(
        "c2r_1024", partial(c2r_y_folded_pallas, interpret=False),
        S((2, 2, 513, 64, 1024), f32),
    )
    for n in (1024, 2048):  # lane-tiled gate range (out-of-core slabs)
        check(
            f"zx_tiled_{n}", partial(zx_tiled_pallas, sign=1, interpret=False),
            S((2, 2, 4, n, n), f32),
        )
        for bz in (4, 8, 32):
            check(
                f"y_tiled_{n}_bz{bz}",
                partial(y_tiled_pallas, sign=1, interpret=False),
                S((2, 2, n, bz, n), f32),
            )

    # the bf16x3 precision route (ZT_FFT_PRECISION=high realized in-kernel
    # as manual hi/lo bf16 split dots): Mosaic must lower the mixed
    # bf16-operand f32-accumulate dot_general.  The kernels read the env
    # knob at trace time, so clear their jit caches around the flip.
    import os as _os

    _os.environ["ZT_FFT_PRECISION"] = "high"
    zx_folded_pallas.clear_cache()
    c2r_y_folded_pallas.clear_cache()
    check(
        "zx_folded_512_bf16x3",
        partial(zx_folded_pallas, sign=1, interpret=False),
        S((2, 2, 257, 512, 512), f32),
    )
    check(
        "c2r_512_bf16x3", partial(c2r_y_folded_pallas, interpret=False),
        S((2, 2, 2, 257, 512, 512), f32),
    )
    del _os.environ["ZT_FFT_PRECISION"]
    zx_folded_pallas.clear_cache()
    c2r_y_folded_pallas.clear_cache()

    # the fused product steps at the bench shape (synthesis kernels + the
    # folded transforms + their composition, exactly as _half_pair_forward
    # dispatches them)
    from zeldovich_tpu.models.pipeline import Zeldovich, _half_pair_forward
    from zeldovich_tpu.utils.params import Parameters

    assets = Path(__file__).parent.parent / "zeldovich_tpu" / "assets"
    ppd = 512
    cfg_dict = dict(
        BoxSize=720.0, NP=ppd**3, CPD=ppd, ICFormat="RVZel",
        InitialConditionsDirectory="/tmp/lower_check",
        InitialRedshift=49.0, ZD_Seed=12346, ZD_NumBlock=2,
        ZD_Pk_scale=1.0, ZD_Pk_norm=8.0, ZD_Pk_sigma=0.0210839935761,
        ZD_Pk_smooth=0.0, ZD_Pk_filename=str(assets / "wmap1new.pow"),
        ZD_Version=2,
    )
    param = Parameters.from_dict(cfg_dict)
    model = Zeldovich(param, dtype=jnp.float32)
    cfg, tables = model.cfg, model.tables
    pk_spec = jax.eval_shape(lambda: model.pk_eff)

    import os

    tspec = jax.tree.map(lambda x: S(x.shape, x.dtype), tables)
    # both route compositions: mega (the TPU default) and the separate
    # kernels (ZT_NO_PALLAS_MEGA).  _half_pair_forward is itself jitted
    # and its trace cache is keyed on avals, not env vars: clear it
    # around each env flip or the second check silently re-lowers the
    # first trace.
    os.environ["ZT_PALLAS_MEGA"] = "1"  # force mega even off-TPU
    _half_pair_forward.clear_cache()
    check(
        f"half_pair_forward_mega_{ppd}",
        partial(_half_pair_forward, cfg, dtype=jnp.float32),
        tspec,
        pk_spec,
    )
    del os.environ["ZT_PALLAS_MEGA"]
    os.environ["ZT_NO_PALLAS_MEGA"] = "1"
    _half_pair_forward.clear_cache()
    check(
        f"half_pair_forward_{ppd}",
        partial(_half_pair_forward, cfg, dtype=jnp.float32),
        tspec,
        pk_spec,
    )
    del os.environ["ZT_NO_PALLAS_MEGA"]
    _half_pair_forward.clear_cache()

    # the PLT composition (pre-gathered coefficient fields, narray=4)
    plt_param = Parameters.from_dict(
        dict(
            cfg_dict,
            ZD_qPLT=1,
            ZD_PLT_filename=str(assets / "eigmodes128"),
            ZD_qPLT_rescale=1,
            ZD_PLT_target_z=5.0,
        )
    )
    plt_model = Zeldovich(plt_param, dtype=jnp.float32)
    coef_spec = jax.tree.map(
        lambda x: S(x.shape, x.dtype), tuple(plt_model.plt_coefs)
    )
    plt_tspec = jax.tree.map(lambda x: S(x.shape, x.dtype), plt_model.tables)
    plt_pk = S(plt_model.pk_eff.shape, plt_model.pk_eff.dtype)
    check(
        f"half_pair_forward_plt_{ppd}",
        lambda t, pk, coefs: _half_pair_forward(
            plt_model.cfg, t, pk, jnp.float32, coefs
        ),
        plt_tspec,
        plt_pk,
        coef_spec,
    )
    _half_pair_forward.clear_cache()

    # PLT through the mega kernel (the TPU default route)
    os.environ["ZT_PALLAS_MEGA"] = "1"
    check(
        f"half_pair_forward_plt_mega_{ppd}",
        lambda t, pk, coefs: _half_pair_forward(
            plt_model.cfg, t, pk, jnp.float32, coefs
        ),
        plt_tspec,
        plt_pk,
        coef_spec,
    )
    del os.environ["ZT_PALLAS_MEGA"]
    _half_pair_forward.clear_cache()

    if failures:
        print("FAILED:", ", ".join(failures))
        return 1
    print("all routes lower clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
