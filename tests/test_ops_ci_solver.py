"""Pallas ci-solver kernel vs the pure-JAX hybrid solver.

Runs the kernel in interpret mode (CPU) over randomized day/night
environments in f32 and requires exact agreement with the pure-JAX
masked-iteration solver — both execute the identical shared body, so any
drift means the kernel plumbing (tiling, padding, masking) is wrong.

Inputs MUST be passed to jit as arguments, not closed-over constants: a
nullary-jitted closure is constant-folded by XLA's HLO evaluator, whose
rounding differs from compiled code by ~1ulp per op, which 40 secant
iterations amplify to ~1e-4 (this construction error made the round-1
version of this suite fail while the kernel itself was parity-correct).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elmkernels_tpu.physics import photosynthesis as P
from elmkernels_tpu.ops.ci_solver import ci_hybrid_solve


def _trait_row(c3: float) -> dict:
    # representative broadleaf-forest traits (c3) / c4 grass kinetics
    return dict(qe=0.05 if c3 < 0.5 else 0.0,
                theta_cj=0.98 if c3 > 0.5 else 0.80,
                mbbopt=4.0 if c3 < 0.5 else 9.0, c3psn=c3)


def _env(n, rng, c3=1.0, c3frac=None):
    pbot = jnp.asarray(rng.uniform(8.0e4, 1.02e5, n), jnp.float32)
    par = jnp.asarray(
        np.where(rng.uniform(size=n) < 0.3, 0.0,
                 rng.uniform(1.0, 500.0, n)), jnp.float32)
    vc = jnp.asarray(rng.uniform(0.0, 60.0, n), jnp.float32)
    f32 = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, n), jnp.float32)
    tr = _trait_row(c3)
    full = lambda v: jnp.full((n,), v, jnp.float32)
    if c3frac is None:
        c3frac = full(tr["c3psn"])
        qe, th, mb = full(tr["qe"]), full(tr["theta_cj"]), full(tr["mbbopt"])
    else:
        a, b = _trait_row(1.0), _trait_row(0.0)
        pick = lambda k: jnp.where(c3frac >= 0.5, a[k], b[k]
                                   ).astype(jnp.float32)
        qe, th, mb = pick("qe"), pick("theta_cj"), pick("mbbopt")
    env = P.CiEnv(
        gb_mol=f32(5.0e3, 5.0e5), je=f32(0.0, 300.0),
        cair=pbot * 355.0e-6, oair=pbot * 0.209,
        lmr_z=f32(0.0, 2.0), par_z=par, rh_can=f32(0.2, 1.0),
        vcmax_z=vc, forc_pbot=pbot, cp=f32(3.0, 6.0),
        kc=f32(30.0, 60.0), ko=f32(2.0e4, 3.0e4),
        tpu_z=f32(0.0, 10.0), kp_z=f32(0.0, 2.0e4),
        bbb=f32(1.0, 40.0), qe=qe, theta_cj=th, mbbopt=mb,
        c3frac=c3frac.astype(jnp.float32))
    enabled = jnp.asarray(rng.uniform(size=n) < 0.85) & (par > 0)
    x0 = jnp.where(env.c3frac >= 0.5, 0.7, 0.4) * env.cair
    return env, enabled, x0


def _compare(env, enabled, x0, mode):
    def ref(x0, env, enabled):
        out0 = P.PsnOut(*([jnp.zeros_like(x0)] * 6))
        return P.hybrid_solve(x0, env, mode, enabled, out0)

    ci_ref, out_ref = jax.jit(ref)(x0, env, enabled)
    ci_k, out_k = ci_hybrid_solve(x0, env, mode, enabled,
                                  block_rows=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(ci_ref), np.asarray(ci_k))
    for name, a, b in zip(P.PsnOut._fields, out_ref, out_k):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


@pytest.mark.parametrize("c3", [1.0, 0.0])
@pytest.mark.parametrize("n", [256, 300])  # 300 exercises tile padding
def test_pallas_matches_lax(c3, n):
    rng = np.random.default_rng(42 + int(c3))
    env, enabled, x0 = _env(n, rng, c3=c3)
    _compare(env, enabled, x0, "c3" if c3 > 0.5 else "c4")


def test_pallas_matches_lax_mixed():
    """Heterogeneous batch: C3 and C4 columns in one solve."""
    n = 300
    rng = np.random.default_rng(3)
    c3frac = jnp.asarray((rng.uniform(size=n) < 0.5).astype(np.float32))
    env, enabled, x0 = _env(n, rng, c3frac=c3frac)
    _compare(env, enabled, x0, "mixed")


def test_mixed_mode_matches_pure():
    """A mixed-mode solve on an all-C3 batch equals the pure-C3 compile
    to the solver's own convergence tolerance.  The two are different
    XLA graphs (mixed carries both pathway branches), so rounding can
    flip a secant convergence test for the odd column near the boundary;
    the answer remains within the secant's eps = 1e-2 relative tol
    (photosynthesis_impl.hh:516)."""
    rng = np.random.default_rng(11)
    env, enabled, x0 = _env(256, rng, c3=1.0)

    def run(mode, x0, env, enabled):
        out0 = P.PsnOut(*([jnp.zeros_like(x0)] * 6))
        return P.hybrid_solve(x0, env, mode, enabled, out0)

    a = jax.jit(lambda *t: run("c3", *t))(x0, env, enabled)
    b = jax.jit(lambda *t: run("mixed", *t))(x0, env, enabled)
    # ci to solver tolerance; >99% of columns should agree to 1e-4
    ci_a, ci_b = np.asarray(a[0]), np.asarray(b[0])
    np.testing.assert_allclose(ci_a, ci_b, rtol=1e-2, atol=1e-4)
    tight = np.isclose(ci_a, ci_b, rtol=1e-4, atol=1e-5).mean()
    assert tight > 0.99, f"only {tight:.2%} of columns tightly equal"


def test_inkernel_mode_identical():
    """The two loop strategies of hybrid_solve agree exactly."""
    rng = np.random.default_rng(7)
    env, enabled, x0 = _env(512, rng, c3=1.0)

    def run(x0, env, enabled, inkernel):
        out0 = P.PsnOut(*([jnp.zeros_like(x0)] * 6))
        return P.hybrid_solve(x0, env, "c3", enabled, out0,
                              inkernel=inkernel)

    a = jax.jit(run, static_argnums=3)(x0, env, enabled, False)
    b = jax.jit(run, static_argnums=3)(x0, env, enabled, True)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
