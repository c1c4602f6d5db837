"""Pallas ci-solver kernel vs the pure-JAX hybrid solver.

Runs the kernel in interpret mode (CPU) over randomized day/night
environments in f32 and requires exact agreement with the pure-JAX
masked-iteration solver — both execute the identical shared body, so any
drift means the kernel plumbing (tiling, padding, masking) is wrong.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elmkernels_tpu.physics import photosynthesis as P
from elmkernels_tpu.ops.ci_solver import ci_hybrid_solve


def _params(c3: float) -> P.PFTPsnParams:
    # representative broadleaf-forest traits (c3) / c4 grass kinetics
    return P.PFTPsnParams(
        fnr=7.16, act25=3.6, kcha=79430.0, koha=36380.0, cpha=37830.0,
        vcmaxha=72000.0, jmaxha=50000.0, tpuha=72000.0, lmrha=46390.0,
        vcmaxhd=200000.0, jmaxhd=200000.0, tpuhd=200000.0,
        lmrhd=150650.0, lmrse=490.0, qe=0.05 if c3 < 0.5 else 0.0,
        theta_cj=0.98 if c3 > 0.5 else 0.80, bbbopt=10000.0 if c3 < 0.5
        else 100.0, mbbopt=4.0 if c3 < 0.5 else 9.0, c3psn=c3,
        slatop=0.012, leafcn=25.0, flnr=0.1365, fnitr=1.0, dleaf=0.04,
        smpso=-66000.0, smpsc=-255000.0, tc_stress=-50.0)


def _env(n, rng):
    pbot = jnp.asarray(rng.uniform(8.0e4, 1.02e5, n), jnp.float32)
    tveg = jnp.asarray(rng.uniform(265.0, 310.0, n), jnp.float32)
    par = jnp.asarray(
        np.where(rng.uniform(size=n) < 0.3, 0.0,
                 rng.uniform(1.0, 500.0, n)), jnp.float32)
    vc = jnp.asarray(rng.uniform(0.0, 60.0, n), jnp.float32)
    return CiEnvLike(pbot, tveg, par, vc, rng, n)


class CiEnvLike:
    def __init__(self, pbot, tveg, par, vc, rng, n):
        f32 = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, n),
                                         jnp.float32)
        self.env = P.CiEnv(
            gb_mol=f32(5.0e3, 5.0e5), je=f32(0.0, 300.0),
            cair=pbot * 355.0e-6, oair=pbot * 0.209,
            lmr_z=f32(0.0, 2.0), par_z=par, rh_can=f32(0.2, 1.0),
            vcmax_z=vc, forc_pbot=pbot, cp=f32(3.0, 6.0),
            kc=f32(30.0, 60.0), ko=f32(2.0e4, 3.0e4),
            tpu_z=f32(0.0, 10.0), kp_z=f32(0.0, 2.0e4),
            bbb=f32(1.0, 40.0))
        self.enabled = jnp.asarray(rng.uniform(size=n) < 0.85) & (par > 0)
        self.x0 = 0.7 * self.env.cair


@pytest.mark.parametrize("c3", [1.0, 0.0])
@pytest.mark.parametrize("n", [256, 300])  # 300 exercises tile padding
def test_pallas_matches_lax(c3, n):
    rng = np.random.default_rng(42 + int(c3))
    e = _env(n, rng)
    p = _params(c3)
    is_c3 = c3 > 0.5

    zero = jnp.zeros_like(e.x0)
    out0 = P.PsnOut(zero, zero, zero, zero, zero, zero)
    ci_ref, out_ref = jax.jit(
        lambda: P.hybrid_solve(e.x0, e.env, p, is_c3, e.enabled, out0))()
    ci_k, out_k = ci_hybrid_solve(e.x0, e.env, p, is_c3, e.enabled,
                                  block_rows=1, interpret=True)

    np.testing.assert_array_equal(np.asarray(ci_ref), np.asarray(ci_k))
    for name, a, b in zip(P.PsnOut._fields, out_ref, out_k):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_inkernel_mode_identical():
    """The two loop strategies of hybrid_solve agree exactly."""
    rng = np.random.default_rng(7)
    e = _env(512, rng)
    p = _params(1.0)
    zero = jnp.zeros_like(e.x0)
    out0 = P.PsnOut(zero, zero, zero, zero, zero, zero)
    a = jax.jit(lambda: P.hybrid_solve(e.x0, e.env, p, True, e.enabled,
                                       out0))()
    b = jax.jit(lambda: P.hybrid_solve(e.x0, e.env, p, True, e.enabled,
                                       out0, inkernel=True))()
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
