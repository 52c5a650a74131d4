"""Pallas Box-Muller kernel vs the jnp pcg_device path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zeldovich_tpu.ops import pcg, pcg_device
from zeldovich_tpu.ops.pallas_synth import boxmuller_pallas


def states_for(seed, ppd):
    mzt, czt = pcg.axis_affine_tables(ppd, 2 * pcg.MAX_PPD)
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

    # reference: jnp path
    s1 = pcg_device.bump(state)
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

    s1 = pcg_device.bump(state)
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
