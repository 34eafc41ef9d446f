"""Matvec-form kernels vs the reference-form kernels."""

import jax.numpy as jnp
import numpy as np

from longcallr_tpu.phasing import kernels as KK
from longcallr_tpu.phasing.kernels_fast import (fast_read_logliks,
                                                fast_snp_sums,
                                                make_fast_tables)


def _data(rng, K=60, I=24):
    p = rng.choice([-1, 0, 1], size=(K, I), p=[0.3, 0.4, 0.3]).astype(np.int8)
    q = rng.integers(3, 31, size=(K, I)).astype(np.uint8)
    ct = KK.make_cell_tables(p, q)
    sigma = jnp.asarray(rng.choice([-1.0, 1.0], size=K))
    delta = jnp.asarray(rng.choice([-1.0, 1.0], size=I))
    eta = jnp.asarray(rng.choice([-1.0, 0.0, 0.0, 1.0], size=I))
    site = jnp.asarray(rng.random(I) < 0.9)
    rbase = jnp.asarray(rng.random(K) < 0.95)
    return ct, sigma, delta, eta, site, rbase


def test_fast_read_logliks(rng):
    ct, sigma, delta, eta, site, rbase = _data(rng)
    rm = rbase & (sigma != 0)
    ft = make_fast_tables(ct, rm, site)
    lp_f, lm_f, nc_f = fast_read_logliks(ft, delta, eta)
    lp, lm, nc = KK.read_logliks(ct, delta, eta, site[None, :])
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lm_f), np.asarray(lm), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(nc_f), np.asarray(nc))


def test_fast_snp_sums(rng):
    ct, sigma, delta, eta, site, rbase = _data(rng)
    rm = rbase & (sigma != 0)
    ft = make_fast_tables(ct, rm, site)
    got = fast_snp_sums(ft, sigma, delta)
    want = KK.snp_sums(ct, sigma, delta, rm, site)
    for g, w, name in zip(got, want,
                          ["s_match", "s_flip", "s_refe", "s_alte", "cov"]):
        if name == "cov":
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        else:
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-12, atol=1e-12, err_msg=name)


def test_fast_cross_optimize_equivalent(rng):
    """A full ascent with fast kernels lands on the same q-values within
    tolerance (states may differ only on exact fp ties)."""
    from longcallr_tpu.phasing.optimize import (PhaseState,
                                                _cross_optimize_loop,
                                                cross_optimize_fast)
    ct, sigma, delta, eta, site, rbase = _data(rng, K=80, I=20)
    st0 = PhaseState(jnp.where(rbase, sigma, 0.0), delta, eta)
    cons = jnp.zeros(delta.shape[0], bool)
    st_a, prob_a = _cross_optimize_loop(ct, st0, rbase, site, cons, False, False)
    st_b, prob_b = cross_optimize_fast(ct, st0, rbase, site, cons, False, False)
    np.testing.assert_allclose(float(prob_a), float(prob_b), rtol=1e-9)
    agree = (np.asarray(st_a.sigma) == np.asarray(st_b.sigma)).mean()
    assert agree > 0.97, agree
