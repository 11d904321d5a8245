"""Fit a Dayhoff-style PAM1 chain to the published NCBI PAM tables.

The printed Dayhoff (1978) PAM1 matrix is rounded to 1e-4, which is too
coarse to reproduce the NCBI PAM tables bit-exactly (rare transitions
like W<->H round to 0).  Instead of chasing the unpublished full-
precision source data, treat the chain itself as the unknown: each
integer score s in a published PAM-n table constrains the underlying
log-odds to [s-1/2, s+1/2) * lambda, and four tables at different
powers (PAM30/70/120 at ln2/2, PAM250 at ln2/3) give 1600 interval
constraints on the 190 free parameters of a reversible 20-state chain.
Gradient-descend interval violations (JAX float64, matrix_power by
squaring) until every constraint holds, i.e. the fitted chain
regenerates all four published tables bit-exactly.  PAM tables for
other n then come from the same chain.

Run:  JAX_PLATFORMS=cpu python experiments/fit_pam.py
Writes the fitted flux matrix to experiments/pam_chain_fit.npz
"""

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import optax

from pyopal_tpu import ScoringMatrix

import gen_pam  # noqa: E402  (same directory; recalled Dayhoff data)

AA = gen_pam.AA
LN2 = float(np.log(2.0))
FREQS = np.array([gen_pam.FREQ[a] for a in AA])
FREQS = FREQS / FREQS.sum()

TABLES = [  # (name, n, lambda)
    ("PAM30", 30, LN2 / 2),
    ("PAM70", 70, LN2 / 2),
    ("PAM120", 120, LN2 / 2),
    ("PAM250", 250, LN2 / 3),
]


def chain_from_flux(log_phi, f):
    """Reversible chain from a symmetric flux parameterization.

    phi[i][j] = f_j * M[i][j] (i != j) is symmetric; diagonals make the
    columns sum to 1.
    """
    phi = jnp.exp(log_phi)
    phi = (phi + phi.T) / 2.0
    phi = phi * (1.0 - jnp.eye(20))
    m = phi / f[None, :]
    m = m + jnp.diag(1.0 - m.sum(axis=0))
    return m


def log_odds(m1, n, f):
    mn = jnp.linalg.matrix_power(m1, n)
    return jnp.log(mn / f[:, None])


def ambiguity_weights(f):
    """(24, 20) weight matrix: rows 0..19 select the residue itself;
    B/Z/X rows are frequency-weighted group averages."""
    w = np.zeros((23, 20))
    w[:20, :20] = np.eye(20)
    for row, members in ((20, "ND"), (21, "QE"), (22, AA)):
        idx = [AA.index(a) for a in members]
        ww = np.asarray(f)[idx]
        w[row, idx] = ww / ww.sum()
    return jnp.asarray(w)


def scores23(m1, n, lam, f, w):
    """Exact (unrounded) 23x23 score matrix: 20x20 log-odds extended to
    B/Z/X by frequency-weighted score averaging."""
    t = log_odds(m1, n, f) / lam
    return w @ t @ w.T


def loss_fn(log_phi, f, targets, w, margin=0.02):
    m1 = chain_from_flux(log_phi, f)
    total = 0.0
    for n, lam, s in targets:
        t = scores23(m1, n, lam, f, w)
        viol = jnp.maximum(0.0, jnp.abs(t - s) - (0.5 - margin))
        total = total + (viol ** 2).sum()
    # keep the diagonal a valid probability
    diag = jnp.diag(m1)
    total = total + (jnp.maximum(0.0, 0.9 - diag) ** 2).sum() * 10.0
    return total


def main():
    targets = []
    refs = {}
    for name, n, lam in TABLES:
        s = ScoringMatrix.from_name(name).data.astype(np.float64)[:23, :23]
        targets.append((n, lam, jnp.asarray(s)))
        refs[name] = s.astype(np.int64)

    f = jnp.asarray(FREQS)
    w = ambiguity_weights(FREQS)
    # init from the recalled printed PAM1 (floored at a tiny prob so
    # log is finite)
    m0 = gen_pam.parse_pam1()
    phi0 = np.maximum(m0 * FREQS[None, :], 1e-9)
    phi0 = np.sqrt(phi0 * phi0.T)
    log_phi = jnp.asarray(np.log(phi0))

    opt = optax.adam(3e-3)
    state = opt.init(log_phi)
    vg = jax.jit(
        jax.value_and_grad(lambda lp: loss_fn(lp, f, targets, w))
    )

    for step in range(30001):
        val, g = vg(log_phi)
        upd, state = opt.update(g, state)
        log_phi = optax.apply_updates(log_phi, upd)
        if step % 2000 == 0:
            # exact-match count at current point
            m1 = chain_from_flux(log_phi, f)
            bad = {}
            for name, n, lam in TABLES:
                t = np.asarray(scores23(m1, n, lam, f, w))
                got = np.floor(t + 0.5).astype(np.int64)
                bad[name] = int((got != refs[name]).sum())
            print(f"step {step}: loss {float(val):.6g} mismatches {bad}")
            if all(v == 0 for v in bad.values()) and float(val) == 0.0:
                break

    m1 = np.asarray(chain_from_flux(log_phi, f))
    np.savez(
        "experiments/pam_chain_fit.npz",
        m1=m1,
        freqs=np.asarray(FREQS),
        alphabet=np.frombuffer(AA.encode(), dtype=np.uint8),
    )
    print("saved experiments/pam_chain_fit.npz")
    print("diag:", np.diag(m1).round(5))
    print("expected mutations per site (PAM):",
          float(1.0 - (np.diag(m1) * FREQS).sum()) * 100)


if __name__ == "__main__":
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
