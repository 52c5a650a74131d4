"""Pallas Box-Muller kernel vs the jnp pcg_device path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zeldovich_tpu.ops import pcg, pcg_device
from zeldovich_tpu.ops.pallas_synth import boxmuller_pallas


def states_for(seed, ppd):
    # the kernel contract takes the state at the mode's FIRST draw: the z
    # table carries one pre-folded LCG step (pcg.prebump_axis_tables)
    mzt, czt = pcg.prebump_axis_tables(
        *pcg.axis_affine_tables(ppd, 2 * pcg.MAX_PPD)
    )
    mxt, cxt = pcg.axis_affine_tables(ppd, 2)
    planes = pcg.plane_state_table(seed, ppd)
    ys, zs, xs = np.meshgrid(
        np.arange(ppd // 2), np.arange(ppd), np.arange(ppd), indexing="ij"
    )
    u = lambda t: pcg_device.unpack(jnp.asarray(t))
    g = pcg_device.gather
    m, c = pcg_device.compose_affine(
        g(u(mzt), zs), g(u(czt), zs), g(u(mxt), xs), g(u(cxt), xs)
    )
    return pcg_device.madd128(m, g(u(planes), ys), c)


@pytest.mark.parametrize("fixed", [False, True])
def test_matches_jnp_path(fixed):
    ppd = 16
    state = states_for(12346, ppd)
    rng = np.random.default_rng(0)
    pk = jnp.asarray(
        rng.uniform(0.1, 2.0, size=(ppd // 2, ppd, ppd)).astype(np.float32)
    )
    live = jnp.asarray(
        (rng.uniform(size=(ppd // 2, ppd, ppd)) > 0.3).astype(np.float32)
    )

    got_re, got_im = boxmuller_pallas(
        state, pk, live, fixed_power=fixed, interpret=True
    )

    # reference: jnp path (state IS the draw-1 state)
    s1 = state
    s2 = pcg_device.bump(s1)
    R = pcg_device.uniform_from_u64(pcg_device.output_u64(s1), jnp.float32)
    T = pcg_device.uniform_from_u64(pcg_device.output_u64(s2), jnp.float32)
    amp = jnp.sqrt(pk) if fixed else jnp.sqrt(-pk * jnp.log(R))
    theta = np.float32(2 * np.pi) * T
    want_re = np.asarray(live * amp * jnp.cos(theta))
    want_im = np.asarray(live * amp * jnp.sin(theta))

    np.testing.assert_allclose(np.asarray(got_re), want_re, atol=2e-6, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(got_im), want_im, atol=2e-6, rtol=2e-6)


def test_integer_chain_bit_exact():
    """The u32-limb bump/output/uniform chain is bit-exact (f64)."""
    ppd = 8
    state = states_for(7, ppd)
    pk = jnp.ones((ppd // 2, ppd, ppd), jnp.float64)
    live = jnp.ones((ppd // 2, ppd, ppd), jnp.float64)
    got_re, got_im = boxmuller_pallas(state, pk, live, interpret=True)

    s1 = state  # draw-1 state: the jump tables carry the first bump
    s2 = pcg_device.bump(s1)
    R = pcg_device.uniform_from_u64(pcg_device.output_u64(s1), jnp.float64)
    T = pcg_device.uniform_from_u64(pcg_device.output_u64(s2), jnp.float64)
    amp = jnp.sqrt(-pk * jnp.log(R))
    theta = 2 * np.pi * T
    np.testing.assert_array_equal(
        np.asarray(got_re), np.asarray(amp * jnp.cos(theta))
    )
    np.testing.assert_array_equal(
        np.asarray(got_im), np.asarray(amp * jnp.sin(theta))
    )


# -- fused synth+pack kernel vs the D-kernel + XLA pack route ---------------

from pathlib import Path

from zeldovich_tpu.models.pipeline import Zeldovich
from zeldovich_tpu.ops.modes_real import (
    _fix_ky0_packed,
    _pack_fix_pad,
    _raw_fields_pair,
)
from zeldovich_tpu.ops.pallas_synth import halfspace_pack_pallas
from zeldovich_tpu.utils.params import Parameters

ASSETS = Path(__file__).parent.parent / "zeldovich_tpu" / "assets"


def _model(ppd=16, **over):
    d = dict(
        BoxSize=100.0,
        NP=ppd**3,
        CPD=100,
        ICFormat="RVZel",
        InitialConditionsDirectory="/tmp/ic_packk",
        InitialRedshift=49.0,
        ZD_Seed=97531,
        ZD_NumBlock=2,
        ZD_Pk_scale=1.0,
        ZD_Pk_norm=8.0,
        ZD_Pk_sigma=0.02,
        ZD_Pk_smooth=0.0,
        ZD_Pk_filename=str(ASSETS / "wmap1new.pow"),
        ZD_Version=2,
    )
    d.update(over)
    return Zeldovich(Parameters.from_dict(d), dtype=jnp.float32)


@pytest.mark.parametrize(
    "over",
    [
        {},
        {"ZD_qPk_fix_to_mean": 1},
        # density/k_cutoff only change the draw-chain masks, covered in
        # the fast tier by the half-spectrum parity cases
        pytest.param({"ZD_qdensity": 2}, marks=pytest.mark.slow),
        pytest.param({"ZD_k_cutoff": 2.0}, marks=pytest.mark.slow),
    ],
    ids=["plain", "fixed_power", "density_only", "k_cutoff"],
)
def test_pack_kernel_bit_equals_xla_pack(over):
    model = _model(**over)
    cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff
    half = cfg.ppd // 2

    got = _fix_ky0_packed(
        halfspace_pack_pallas(
            cfg, tables.planes, tables.mzx, tables.czx, pk_eff,
            fixed_power=cfg.fixed_power, just_density=cfg.just_density,
            interpret=True,
        ),
        half,
    )

    y = jnp.arange(half)[:, None, None]
    z = jnp.arange(cfg.ppd)[None, :, None]
    x = jnp.arange(cfg.ppd)[None, None, :]
    D, F, G, H, _ = _raw_fields_pair(
        y, z, x, cfg, tables, jnp.float32, identity_grid=True, pk_eff=pk_eff
    )
    if cfg.just_density:
        zero2 = (jnp.zeros_like(D[0]), jnp.zeros_like(D[1]))
        want = _pack_fix_pad(D, zero2, half)[None]
        # no field math: the draw chain is multiply-only, so the kernel
        # is bit-exact vs the XLA pack
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        return
    want = jnp.stack(
        [_pack_fix_pad(D, F, half), _pack_fix_pad(G, H, half)]
    )
    got, want = np.asarray(got), np.asarray(want)
    # the a - b*c packing shapes contract to FMAs differently between the
    # kernel and the XLA pack graph: ~1-2 ulp input noise, amplified by
    # cancellation -- bounded in ABSOLUTE scale
    np.testing.assert_allclose(got, want, atol=1e-7 * np.abs(want).max())
    # structural exactness survives: the appended y-Nyquist row is +0.0
    # bytes and zero-ruled modes are exactly zero
    nyq = got[:, :, :, half]
    assert nyq.tobytes() == b"\x00" * nyq.nbytes
    np.testing.assert_array_equal(got == 0.0, want == 0.0)


def test_pack_kernel_through_transforms():
    """The fused kernel's packed spectrum drives the half-spectrum inverse
    transform to the same x-space as the complex full-grid path (the
    TPU-route equivalent of the pipeline's kspace_half_pair)."""
    model = _model(ppd=16)
    cfg, tables = model.cfg, model.tables
    spm = _fix_ky0_packed(
        halfspace_pack_pallas(
            cfg, tables.planes, tables.mzx, tables.czx, model.pk_eff,
            interpret=True,
        ),
        cfg.ppd // 2,
    )
    assert spm.shape == (2, 2, 2, 9, 16, 16)
    from zeldovich_tpu.ops import mmfft

    got = np.asarray(mmfft.ifft3_half_pair(spm))
    want = np.asarray(model.xspace_pair())
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


@pytest.mark.parametrize(
    "case",
    [
        "plain",
        # density/fixed are ~5-7 s; the density and fixed draw chains are
        # covered fast by the half-spectrum parity cases -- keep the
        # default (plain) mega composition fast
        pytest.param("density", marks=pytest.mark.slow),
        pytest.param("fixed", marks=pytest.mark.slow),
    ],
)
def test_mega_kernel_matches_composition(case):
    """halfspace_pack_zx_pallas (interpret) == pack + ky0-fix + XLA z/x
    transforms, at f32 tolerance (folding reorders the contractions)."""
    import jax.numpy as jnp

    from zeldovich_tpu.ops import mmfft
    from zeldovich_tpu.ops.modes_real import synthesize_half_pair
    from zeldovich_tpu.ops.pallas_synth import halfspace_pack_zx_pallas

    over = {}
    if case == "density":
        over["ZD_qdensity"] = 2
    if case == "fixed":
        over["ZD_qPk_fix_to_mean"] = 1
    model = _model(ppd=16, **over)
    cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff
    assert tables.mzx is not None and pk_eff is not None

    spm = synthesize_half_pair(cfg, tables, dtype=jnp.float32, pk_eff=pk_eff)
    re, im = spm[..., 0, :, :, :], spm[..., 1, :, :, :]
    for ax in (-2, -1):
        re, im = mmfft.cfft_axis(re, im, ax, +1)
    want = np.asarray(jnp.stack([re, im], axis=-4))

    got = np.asarray(
        halfspace_pack_zx_pallas(
            cfg, tables.planes, tables.mzx, tables.czx, pk_eff,
            fixed_power=cfg.fixed_power, just_density=cfg.just_density,
            interpret=True,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


@pytest.mark.parametrize("g", [2, 4])
@pytest.mark.parametrize("flavor", ["plain", "plt"])
def test_mega_pair_kernel_matches_serial(monkeypatch, g, flavor):
    """ZT_MEGA_PAIR=g (g rows per grid step, Nyquist-free ky extent) is
    bit-identical to the serial mega kernel on the data rows, and its
    even-ky output round-trips through c2r_y_folded_pallas's analytic
    Nyquist drop (pallas_fft._c2r_math has_nyq=False) bit-identically."""
    from zeldovich_tpu.ops.pallas_fft import c2r_y_folded_pallas
    from zeldovich_tpu.ops.pallas_synth import halfspace_pack_zx_pallas

    model = _plt_model() if flavor == "plt" else _model()
    cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff
    coefs = model.plt_coefs if flavor == "plt" else None
    kw = dict(fixed_power=cfg.fixed_power, just_density=cfg.just_density,
              interpret=True, plt_coefs=coefs)

    monkeypatch.delenv("ZT_MEGA_PAIR", raising=False)
    halfspace_pack_zx_pallas.clear_cache()
    base = np.asarray(halfspace_pack_zx_pallas(
        cfg, tables.planes, tables.mzx, tables.czx, pk_eff, **kw))
    half = base.shape[3] - 1
    assert np.all(base[:, :, :, half] == 0)  # the omitted row is zero

    monkeypatch.setenv("ZT_MEGA_PAIR", str(g))
    halfspace_pack_zx_pallas.clear_cache()
    try:
        pair = np.asarray(halfspace_pack_zx_pallas(
            cfg, tables.planes, tables.mzx, tables.czx, pk_eff, **kw))
    finally:
        halfspace_pack_zx_pallas.clear_cache()
    assert pair.shape[3] == half
    np.testing.assert_array_equal(base[:, :, :, :half], pair)

    got = np.asarray(c2r_y_folded_pallas(jnp.asarray(pair), interpret=True))
    want = np.asarray(c2r_y_folded_pallas(jnp.asarray(base), interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow  # 30 s 128^3 interpret run (the composition tests
# above keep fast-tier mega coverage)
def test_mega_forward_route(monkeypatch):
    """The ZT_PALLAS_MEGA forward route == the default route, end-to-end
    through Zeldovich.xspace_half_pair (CPU interpret via ZT_PALLAS_FORCE)."""
    from zeldovich_tpu.models import pipeline as pl_mod
    from zeldovich_tpu.ops.modes_real import use_mega_forward

    model = _model(ppd=128, NP=128**3, CPD=128)
    want = np.asarray(model.xspace_half_pair())

    monkeypatch.setenv("ZT_PALLAS_FORCE", "1")
    monkeypatch.setenv("ZT_PALLAS_MEGA", "1")
    assert use_mega_forward(
        model.cfg, model.tables, jnp.float32, model.pk_eff
    )
    pl_mod._half_pair_forward.clear_cache()
    try:
        got = np.asarray(model.xspace_half_pair())
    finally:
        monkeypatch.delenv("ZT_PALLAS_MEGA")
        monkeypatch.delenv("ZT_PALLAS_FORCE")
        pl_mod._half_pair_forward.clear_cache()
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


# -- PLT through the fused pack kernel (pre-gathered coefficient fields) ----


def _plt_model(ppd=16, **over):
    return _model(
        ppd,
        ZD_qPLT=1,
        ZD_PLT_filename=str(ASSETS / "eigmodes128"),
        ZD_qPLT_rescale=1,
        ZD_PLT_target_z=5.0,
        **over,
    )


@pytest.mark.slow  # ~10 s; fast-tier PLT pallas coverage stays via the
# default-route test_plt_mega_kernel_matches_composition
def test_plt_pack_kernel_matches_xla_pack():
    """The fused pack kernel with pre-gathered PLT coefficient fields ==
    the XLA PLT pack path (4-array layout incl. velocity packings)."""
    from zeldovich_tpu.ops.modes_real import synthesize_half_pair

    model = _plt_model()
    cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff
    coefs = model.plt_coefs
    assert coefs is not None and len(coefs) == 4
    half = cfg.ppd // 2

    got = np.asarray(
        _fix_ky0_packed(
            halfspace_pack_pallas(
                cfg, tables.planes, tables.mzx, tables.czx, pk_eff,
                fixed_power=cfg.fixed_power, just_density=cfg.just_density,
                interpret=True, plt_coefs=coefs,
            ),
            half,
        )
    )
    want = np.asarray(
        synthesize_half_pair(cfg, tables, dtype=jnp.float32, pk_eff=pk_eff)
    )
    assert got.shape == want.shape == (4, 2, 2, half + 1, 16, 16)
    # same FMA-contraction caveat as the non-PLT pack parity test
    np.testing.assert_allclose(got, want, atol=1e-6 * np.abs(want).max())
    np.testing.assert_array_equal(got == 0.0, want == 0.0)


@pytest.mark.slow  # ~15 s; the mega composition test keeps the default
# PLT kernel route in the fast tier
def test_plt_forward_route_matches(monkeypatch):
    """End-to-end: xspace_half_pair through the fused PLT kernel route
    (ZT_PALLAS_FORCE interpret) == the XLA route, and both == the complex
    full-grid pipeline."""
    from zeldovich_tpu.models import pipeline as pl_mod

    model = _plt_model()
    want = np.asarray(model.xspace_half_pair())  # XLA route on CPU

    monkeypatch.setenv("ZT_PALLAS_FORCE", "1")
    pl_mod._half_pair_forward.clear_cache()
    try:
        from zeldovich_tpu.ops.modes_real import _use_pallas_pack

        assert _use_pallas_pack(
            model.cfg, model.tables, jnp.float32, model.pk_eff,
            model.plt_coefs,
        )
        got = np.asarray(model.xspace_half_pair())
    finally:
        monkeypatch.delenv("ZT_PALLAS_FORCE")
        pl_mod._half_pair_forward.clear_cache()
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())

    cplx = np.asarray(model.xspace())
    np.testing.assert_allclose(
        got[:, 0] + 1j * got[:, 1], cplx, atol=2e-5 * np.abs(cplx).max()
    )


def test_plt_mega_kernel_matches_composition():
    """PLT through the mega kernel (interpret) == pack + ky0-fix + XLA
    z/x transforms with the same coefficient planes."""
    from zeldovich_tpu.ops import mmfft
    from zeldovich_tpu.ops.modes_real import synthesize_half_pair
    from zeldovich_tpu.ops.pallas_synth import halfspace_pack_zx_pallas

    model = _plt_model(ppd=16)
    cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff
    coefs = model.plt_coefs

    spm = synthesize_half_pair(
        cfg, tables, dtype=jnp.float32, pk_eff=pk_eff
    )
    re, im = spm[..., 0, :, :, :], spm[..., 1, :, :, :]
    for ax in (-2, -1):
        re, im = mmfft.cfft_axis(re, im, ax, +1)
    want = np.asarray(jnp.stack([re, im], axis=-4))

    got = np.asarray(
        halfspace_pack_zx_pallas(
            cfg, tables.planes, tables.mzx, tables.czx, pk_eff,
            fixed_power=cfg.fixed_power, just_density=cfg.just_density,
            interpret=True, plt_coefs=coefs,
        )
    )
    assert got.shape == want.shape == (4, 2, 2, 9, 16, 16)
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


@pytest.mark.slow  # 128^3 interpret run (the smallest mega-gated grid)
def test_plt_mega_forward_route(monkeypatch):
    """The PLT forward through the mega kernel (the TPU default route,
    forced on CPU) matches the separate-kernel route end-to-end."""
    from zeldovich_tpu.models import pipeline as pl_mod
    from zeldovich_tpu.ops.modes_real import use_mega_forward

    model = _plt_model(ppd=128, NP=128**3, CPD=128)
    want = np.asarray(model.xspace_half_pair())

    monkeypatch.setenv("ZT_PALLAS_FORCE", "1")
    monkeypatch.setenv("ZT_PALLAS_MEGA", "1")
    assert use_mega_forward(
        model.cfg, model.tables, jnp.float32, model.pk_eff, model.plt_coefs
    )
    pl_mod._half_pair_forward.clear_cache()
    try:
        got = np.asarray(model.xspace_half_pair())
    finally:
        pl_mod._half_pair_forward.clear_cache()
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max())


def test_madd16_gate_bit_exact(monkeypatch):
    """ZT_MADD16 (16-bit-column madd/bump form) is bit-exact: raw
    _madd128 A/B over random limb tuples, and the full f64 draw kernel
    produces identical bytes under the gate."""
    from zeldovich_tpu.ops import pallas_synth

    rng = np.random.RandomState(11)
    mk = lambda: tuple(
        jnp.asarray(rng.randint(0, 2**32, size=(5, 7), dtype=np.uint64)
                    .astype(np.uint32))
        for _ in range(4)
    )
    m, s, c = mk(), mk(), mk()
    base = pallas_synth._madd128(m, s, c)
    cols = pallas_synth._madd128_cols16(m, s, c)
    for a, b in zip(base, cols):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # edge limbs: all-ones everywhere (max carries)
    ones = tuple(jnp.full((3,), 0xFFFFFFFF, jnp.uint32) for _ in range(4))
    for a, b in zip(
        pallas_synth._madd128(ones, ones, ones),
        pallas_synth._madd128_cols16(ones, ones, ones),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ppd = 16
    state = states_for(12346, ppd)
    pk = jnp.ones((ppd // 2, ppd, ppd), jnp.float64)
    live = jnp.ones((ppd // 2, ppd, ppd), jnp.float64)
    base_re, base_im = boxmuller_pallas(state, pk, live, interpret=True)
    monkeypatch.setenv("ZT_MADD16", "1")
    got_re, got_im = boxmuller_pallas(state, pk, live, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_re), np.asarray(base_re))
    np.testing.assert_array_equal(np.asarray(got_im), np.asarray(base_im))


@pytest.mark.parametrize("flavor", ["plain", "plt", "density"])
def test_mega_pipe_matches_serial(monkeypatch, flavor):
    """ZT_MEGA_PIPE (software-pipelined mega kernel: draw row i, dot row
    i-1 from VMEM scratch) == the serial mega kernel, bit-identically
    (same per-row expressions, one extra grid step)."""
    from zeldovich_tpu.ops.pallas_synth import halfspace_pack_zx_pallas

    if flavor == "plt":
        model = _plt_model(ppd=16)
        coefs = model.plt_coefs
    else:
        over = {"ZD_qdensity": 2} if flavor == "density" else {}
        model = _model(ppd=16, **over)
        coefs = None
    cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff

    def run():
        # the knob is read at trace time: retrace on every call
        halfspace_pack_zx_pallas.clear_cache()
        return np.asarray(
            halfspace_pack_zx_pallas(
                cfg, tables.planes, tables.mzx, tables.czx, pk_eff,
                fixed_power=cfg.fixed_power,
                just_density=cfg.just_density,
                interpret=True, plt_coefs=coefs,
            )
        )

    monkeypatch.delenv("ZT_MEGA_PIPE", raising=False)
    want = run()
    monkeypatch.setenv("ZT_MEGA_PIPE", "1")
    try:
        got = run()
    finally:
        monkeypatch.delenv("ZT_MEGA_PIPE", raising=False)
        halfspace_pack_zx_pallas.clear_cache()
    np.testing.assert_array_equal(got, want)
