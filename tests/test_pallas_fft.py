"""Folded dense-DFT Pallas kernel vs the XLA matmul forms (interpret)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zeldovich_tpu.ops import mmfft
from zeldovich_tpu.ops.pallas_fft import zx_folded_pallas


@pytest.mark.parametrize("n", [16, 32, 64])
@pytest.mark.parametrize("sign", [+1, -1])
def test_folded_matches_numpy(n, sign):
    rng = np.random.default_rng(0)
    z = rng.normal(size=(3, 4, n, n)) + 1j * rng.normal(size=(3, 4, n, n))
    spm = jnp.stack(
        [jnp.asarray(z.real, jnp.float32), jnp.asarray(z.imag, jnp.float32)],
        axis=1,
    )  # (3, 2, 4, n, n)
    got = np.asarray(zx_folded_pallas(spm, sign=sign, interpret=True))
    want = np.fft.ifft2(z) * n * n if sign == +1 else np.fft.fft2(z)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got[:, 0], want.real, atol=4e-7 * scale)
    np.testing.assert_allclose(got[:, 1], want.imag, atol=4e-7 * scale)


def test_folded_matches_xla_form():
    """Same transform as the cfft_axis route, at f32 accuracy."""
    rng = np.random.default_rng(1)
    n, k = 32, 5
    spm = jnp.asarray(
        rng.normal(size=(2, 2, 2, k, n, n)), jnp.float32
    )  # the half-spectrum layout (narray, pm, reim, ky, Z, X)
    got = np.asarray(zx_folded_pallas(spm, +1, interpret=True))
    re, im = spm[..., 0, :, :, :], spm[..., 1, :, :, :]
    for ax in (-2, -1):
        re, im = mmfft.cfft_axis(re, im, ax, +1)
    want = np.asarray(jnp.stack([re, im], axis=-4))
    np.testing.assert_allclose(got, want, atol=4e-7 * np.abs(want).max())


def test_half_pipeline_with_folded_kernel():
    """ifft3_half_pair with the folded kernel forced on equals the XLA
    route at f32 accuracy (the TPU gating path, exercised in interpret)."""
    from pathlib import Path

    from zeldovich_tpu.models.pipeline import Zeldovich
    from zeldovich_tpu.ops.modes_real import synthesize_half_pair
    from zeldovich_tpu.utils.params import Parameters

    assets = Path(__file__).parent.parent / "zeldovich_tpu" / "assets"
    param = Parameters.from_dict(
        dict(
            BoxSize=100.0,
            NP=16**3,
            CPD=100,
            ICFormat="RVZel",
            InitialConditionsDirectory="/tmp/ic_fold",
            InitialRedshift=49.0,
            ZD_Seed=4242,
            ZD_NumBlock=2,
            ZD_Pk_scale=1.0,
            ZD_Pk_norm=8.0,
            ZD_Pk_sigma=0.02,
            ZD_Pk_smooth=0.0,
            ZD_Pk_filename=str(assets / "wmap1new.pow"),
            ZD_Version=2,
        )
    )
    model = Zeldovich(param, dtype=jnp.float32)
    spm = synthesize_half_pair(
        model.cfg, model.tables, dtype=jnp.float32, pk_eff=model.pk_eff
    )
    got = np.asarray(
        mmfft.c2r_y_pair(zx_folded_pallas(spm, +1, interpret=True))
    )
    want = np.asarray(mmfft.ifft3_half_pair(spm))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


@pytest.mark.parametrize("n", [16, 32, 64])
def test_c2r_pallas_matches_plain(n):
    """c2r_y_folded_pallas (interpret) == c2r_y_pair at f32 accuracy."""
    from zeldovich_tpu.ops.pallas_fft import c2r_y_folded_pallas

    rng = np.random.default_rng(3)
    h = n // 2
    spm = jnp.asarray(rng.normal(size=(2, 2, 2, h + 1, n, n)), jnp.float32)
    got = np.asarray(c2r_y_folded_pallas(spm, interpret=True))
    want = np.asarray(mmfft.c2r_y_pair(spm))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=4e-7 * np.abs(want).max())


@pytest.mark.parametrize("n", [16, 32])
def test_c2r_pallas_even_ky_drops_nyquist(n):
    """An even ky extent (h rows, the ZT_MEGA_PAIR producer form) equals
    the h+1 form with a zero Nyquist row, bit-for-bit."""
    from zeldovich_tpu.ops.pallas_fft import c2r_y_folded_pallas

    rng = np.random.default_rng(7)
    h = n // 2
    spm = jnp.asarray(rng.normal(size=(2, 2, 2, h + 1, n, n)), jnp.float32)
    spm = spm.at[:, :, :, h].set(0.0)
    want = np.asarray(c2r_y_folded_pallas(spm, interpret=True))
    got = np.asarray(
        c2r_y_folded_pallas(spm[:, :, :, :h], interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_full_pallas_route_matches_xla():
    """zx kernel + Pallas c2r == ifft3_half_pair's XLA route (f32)."""
    from zeldovich_tpu.ops.pallas_fft import c2r_y_folded_pallas

    rng = np.random.default_rng(4)
    n, h = 32, 16
    spm = jnp.asarray(rng.normal(size=(2, 2, 2, h + 1, n, n)), jnp.float32)
    g = zx_folded_pallas(spm, +1, interpret=True)
    got = np.asarray(c2r_y_folded_pallas(g, interpret=True))
    want = np.asarray(mmfft.ifft3_half_pair(spm))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


@pytest.mark.parametrize("sign", [+1, -1])
def test_ooc_slab_layout_matches_xla(sign):
    """zx kernel on an out-of-core y-slab (narray, 2, ny, Z, X) == the
    XLA cfft_axis loop the slab kernels use off-TPU (layout check for
    models/outofcore._synth_ifft_zx_pair / _fwd_zx_pair routing)."""
    rng = np.random.default_rng(5)
    n, ny = 16, 3
    k = jnp.asarray(rng.normal(size=(2, 2, ny, n, n)), jnp.float32)
    got = np.asarray(zx_folded_pallas(k, sign, interpret=True))
    p = jnp.swapaxes(k, 0, 1)
    for ax in (-2, -1):
        re, im = mmfft.cfft_axis(p[0], p[1], ax, sign)
        p = jnp.stack([re, im])
    want = np.asarray(jnp.swapaxes(p, 0, 1))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


@pytest.mark.parametrize("sign", [+1, -1])
def test_tiled_matches_fused(sign):
    """Two-pass tiled kernel == the fused zx kernel (same folded math)."""
    from zeldovich_tpu.ops.pallas_fft import zx_tiled_pallas

    rng = np.random.default_rng(6)
    n = 32
    spm = jnp.asarray(rng.normal(size=(2, 2, 3, n, n)), jnp.float32)
    got = np.asarray(zx_tiled_pallas(spm, sign, tile=8, interpret=True))
    want = np.asarray(zx_folded_pallas(spm, sign, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


def test_forced_routing_half_step(monkeypatch):
    """ifft3_half_pair's TPU routing (ZT_PALLAS_FORCE, interpret) == the
    XLA route on the same input -- the bench-path dispatch itself."""
    from zeldovich_tpu.ops.pallas_fft import use_c2r_pallas, use_zx_folded

    rng = np.random.default_rng(12)
    n, h = 128, 64
    spm = jnp.asarray(
        rng.normal(size=(2, 2, 2, h + 1, n, n)), jnp.float32
    )
    want = np.asarray(mmfft.ifft3_half_pair(spm))
    monkeypatch.setenv("ZT_PALLAS_FORCE", "1")
    assert use_zx_folded(spm.dtype, n) and use_c2r_pallas(spm.dtype, n)
    got = np.asarray(mmfft.ifft3_half_pair(spm))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


@pytest.mark.parametrize(
    "narray",
    [
        1,
        2,
        # narray=4 (PLT) lead shapes are ~4.5 s and exercised by the PLT
        # mega-route fast test
        pytest.param(4, marks=pytest.mark.slow),
    ],
)
def test_kernel_route_lead_shapes(narray):
    """zx + c2r kernels handle density (1), RVZel (2), PLT (4) leads."""
    from zeldovich_tpu.ops.pallas_fft import c2r_y_folded_pallas

    rng = np.random.default_rng(9)
    n, h = 16, 8
    spm = jnp.asarray(
        rng.normal(size=(narray, 2, 2, h + 1, n, n)), jnp.float32
    )
    g = zx_folded_pallas(spm, +1, interpret=True)
    got = np.asarray(c2r_y_folded_pallas(g, interpret=True))
    want = np.asarray(mmfft.ifft3_half_pair(spm))
    assert got.shape == want.shape == (narray, 2, n, n, n)
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


@pytest.mark.parametrize("sign", [+1, -1])
def test_y_tiled_matches_xla(sign):
    """y_tiled_pallas == cfft_axis(-3) on the OOC z-slab layout."""
    from zeldovich_tpu.ops.pallas_fft import y_tiled_pallas

    rng = np.random.default_rng(8)
    n, bz, X = 16, 3, 32
    zslab = jnp.asarray(rng.normal(size=(2, 2, n, bz, X)), jnp.float32)
    got = np.asarray(y_tiled_pallas(zslab, sign, tile=8, interpret=True))
    p = jnp.swapaxes(zslab, 0, 1)
    re, im = mmfft.cfft_axis(p[0], p[1], -3, sign)
    want = np.asarray(jnp.swapaxes(jnp.stack([re, im]), 0, 1))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


def test_c2r_folded_matches_plain():
    """_c2r_y_pair_folded == c2r_y_pair at f32 accuracy (TPU-gated form)."""
    import jax

    rng = np.random.default_rng(2)
    n, h = 32, 16
    spm = jnp.asarray(
        rng.normal(size=(2, 2, 2, h + 1, n, n)), jnp.float32
    )
    got = np.asarray(
        mmfft._c2r_y_pair_folded(spm, jax.lax.Precision.HIGHEST)
    )
    want = np.asarray(mmfft.c2r_y_pair(spm))
    np.testing.assert_allclose(got, want, atol=4e-7 * np.abs(want).max())


@pytest.mark.parametrize("bz", [1, 3, 4, 8, 12, 16])
def test_y_tiled_bz_blocking(bz):
    """Every Bz thickness takes a Mosaic-legal route (8-block, whole-dim
    block, or the XLA fallback) and agrees with cfft_axis(-3).

    Regression for the 1-thick z-block specs that only the real TPU
    lowering rejects: n/X here are >= 128 so the trace-time block check
    (pallas_fft._assert_mosaic_blocks) is armed.
    """
    from zeldovich_tpu.ops.pallas_fft import y_tiled_pallas

    rng = np.random.default_rng(bz)
    n = X = 128
    zslab = jnp.asarray(rng.normal(size=(2, n, bz, X)), jnp.float32)
    got = np.asarray(y_tiled_pallas(zslab, +1, interpret=True))
    re, im = mmfft.cfft_axis(zslab[0], zslab[1], -3, +1)
    want = np.asarray(jnp.stack([re, im]))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


def test_y_tile_vmem_budget():
    """The y_tiled lane tile is budgeted by TOTAL block bytes including
    the full Y extent, not just the dot-group width.

    Regression for the round-3 VMEM OOM: n = X = 1024 with w = 512
    needed 149M of the chip's 128M VMEM; the budget must shrink w (and
    fall back to XLA when even w = 128 cannot fit).
    """
    from zeldovich_tpu.ops.pallas_fft import (
        _VMEM_WINDOW_BUDGET,
        _win_bytes,
        _y_tile_w,
    )

    # the measured-good shape keeps its full-width tile
    assert _y_tile_w(512, 8, 512, 512) == 512
    # the measured-OOM shape must shrink until the windows fit
    w = _y_tile_w(1024, 8, 1024, 512)
    assert w is not None and w < 512
    assert _win_bytes(1024, 8, w) <= _VMEM_WINDOW_BUDGET
    w = _y_tile_w(2048, 8, 2048, 512)
    assert w is not None
    assert _win_bytes(2048, 8, w) <= _VMEM_WINDOW_BUDGET
    # a shape no legal tile can fit falls back (w=128 floor still too big)
    assert _y_tile_w(16384, 8, 1024, 512) is None


def test_y_tiled_oversize_falls_back():
    """A slab whose smallest lane tile blows VMEM takes the XLA route and
    still returns correct values (interpret mode; the route must not
    raise)."""
    from zeldovich_tpu.ops import pallas_fft

    orig = pallas_fft._VMEM_WINDOW_BUDGET
    pallas_fft._VMEM_WINDOW_BUDGET = 1  # force the no-tile-fits branch
    pallas_fft.y_tiled_pallas.clear_cache()  # the budget is read at trace time
    try:
        rng = np.random.default_rng(5)
        n = X = 128
        zslab = jnp.asarray(rng.normal(size=(2, n, 8, X)), jnp.float32)
        got = np.asarray(pallas_fft.y_tiled_pallas(zslab, +1, interpret=True))
    finally:
        pallas_fft._VMEM_WINDOW_BUDGET = orig
        pallas_fft.y_tiled_pallas.clear_cache()
    re, im = mmfft.cfft_axis(zslab[0], zslab[1], -3, +1)
    want = np.asarray(jnp.stack([re, im]))
    np.testing.assert_allclose(got, want, atol=2e-6 * np.abs(want).max())


def test_bf16x3_precision_route(monkeypatch):
    """ZT_FFT_PRECISION=high inside the kernels: the manual 3-pass bf16
    split (_kdot's "bf16x3" mode -- Mosaic cannot lower Precision.HIGH)
    stays within ~1e-5 of the f64 transform, i.e. an 18-bit effective
    mantissa, vs ~3e-7 for the default 6-pass HIGHEST route."""
    from zeldovich_tpu.ops.pallas_fft import (
        _pallas_precision,
        c2r_y_folded_pallas,
    )

    rng = np.random.default_rng(3)
    n, h = 32, 16
    spm = jnp.asarray(rng.normal(size=(2, 2, 2, h + 1, n, n)), jnp.float32)
    import jax
    from jax import lax

    re, im = (
        spm[..., 0, :, :, :].astype(jnp.float64),
        spm[..., 1, :, :, :].astype(jnp.float64),
    )
    for ax in (-2, -1):
        # pin the reference precision: it must not follow the env knob
        re, im = mmfft.cfft_axis(re, im, ax, +1,
                                 precision=lax.Precision.HIGHEST)
    want_zx = jnp.stack([re, im], axis=-4)
    want_y = mmfft.c2r_y_pair(
        want_zx.astype(jnp.float32), precision=lax.Precision.HIGHEST
    )

    monkeypatch.setenv("ZT_FFT_PRECISION", "high")
    zx_folded_pallas.clear_cache()
    c2r_y_folded_pallas.clear_cache()
    try:
        assert _pallas_precision() == "bf16x3"
        got_zx = zx_folded_pallas(spm, +1, interpret=True)
        scale = float(jnp.abs(want_zx).max())
        assert float(jnp.abs(got_zx - want_zx).max()) < 2e-5 * scale
        got_y = np.asarray(
            c2r_y_folded_pallas(got_zx.astype(jnp.float32), interpret=True)
        )
        np.testing.assert_allclose(
            got_y, np.asarray(want_y), atol=5e-5 * np.abs(want_y).max()
        )
    finally:
        monkeypatch.delenv("ZT_FFT_PRECISION")
        zx_folded_pallas.clear_cache()
        c2r_y_folded_pallas.clear_cache()


def test_kdot_bf16x3_accuracy():
    """_kdot's manual 3-pass bf16 split carries ~18 effective mantissa
    bits: well inside 1e-5 relative of the f64 product, and ~50x better
    than a single bf16 pass."""
    from jax import lax

    from zeldovich_tpu.ops.pallas_fft import _kdot

    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    want = np.asarray(M, np.float64) @ np.asarray(x, np.float64)
    scale = np.abs(want).max()

    x3 = np.abs(np.asarray(_kdot(M, x, "bf16x3")) - want).max() / scale
    assert x3 < 1e-5, x3
    # and the plain passthrough is untouched
    hi = np.abs(
        np.asarray(_kdot(M, x, lax.Precision.HIGHEST)) - want
    ).max() / scale
    assert hi < 1e-6, hi
