"""Two-stage VT-chain recovery from the VTML80 anchor.

Stage 1 (this file's main loop) avoids the matrix exponential
entirely: the unknowns are the *exact* distance-80 scores ``t`` (each
bounded inside its published integer's half-unit rounding interval by
construction), the stationary frequencies ``f`` and the scale
``lambda``.  Exactness of the probabilistic model is a set of 20
marginal constraints: with joint probabilities
``P_ab = exp(lam * t_ab) * f_a * f_b``, each row must marginalize to
``f_a`` (``sum_b exp(lam t_ab) f_b = 1``).  The derived B/Z/X rows
(odds-mixture rule, as proven for the NCBI PAM tables in fit_pam2.py)
must round to the published rows as soft constraints.

Stage 2 recovers the generator as the principal matrix logarithm of
``M(80) = P / f`` (column-stochastic), clips numerically-negative
off-diagonal rates, and verifies the cleaned chain still regenerates
VTML80 bit-exactly through the production code path.

Run:  JAX_PLATFORMS=cpu python experiments/fit_vtml2.py
Writes experiments/vtml_chain_fit2.npz.
"""

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax
import scipy.linalg

from pyopal_tpu import ScoringMatrix

AA = "ARNDCQEGHILKMFPSTWYV"
MARGIN = 0.03


def derived_bzx(t, f, lam):
    """B/Z/X rows from the exact 20x20 scores (odds rule for B/Z)."""
    r = jnp.exp(lam * t)
    idxN, idxD = AA.index("N"), AA.index("D")
    idxQ, idxE = AA.index("Q"), AA.index("E")
    wB = jnp.zeros(20).at[jnp.asarray([idxN, idxD])].set(
        f[jnp.asarray([idxN, idxD])]
    )
    wZ = jnp.zeros(20).at[jnp.asarray([idxQ, idxE])].set(
        f[jnp.asarray([idxQ, idxE])]
    )
    wB, wZ = wB / wB.sum(), wZ / wZ.sum()
    wbz = jnp.stack([wB, wZ])
    rows = jnp.log(wbz @ r) / lam  # (2, 20)
    pair = jnp.log(wbz @ r @ wbz.T) / lam
    xrow = f @ t
    xbz = wbz @ xrow
    xx = f @ t @ f
    return rows, pair, xrow, xbz, xx


def main():
    target = ScoringMatrix.from_name("VTML80").data.astype(np.float64)[
        :23, :23
    ]
    tgt20 = jnp.asarray(target[:20, :20])
    tgt_rows = jnp.asarray(target[20:22, :20])
    tgt_pair = jnp.asarray(target[20:22, 20:22])
    tgt_x = jnp.asarray(target[22, :20])
    tgt_xbz = jnp.asarray(target[22, 20:22])
    tgt_xx = jnp.asarray(target[22, 22])

    params = {
        "u": jnp.zeros((20, 20)),
        "log_f": jnp.asarray(np.log(np.full(20, 0.05))),
        "log_lam": jnp.asarray(np.log(np.log(2.0) / 3.0)),
    }

    def exact_scores(p):
        u = (p["u"] + p["u"].T) / 2.0  # symmetric offsets
        return tgt20 + (0.5 - MARGIN) * jnp.tanh(u)

    def loss_fn(p):
        t = exact_scores(p)
        f = jax.nn.softmax(p["log_f"])
        lam = jnp.exp(p["log_lam"])
        marg = jnp.exp(lam * t) @ f - 1.0  # (20,)
        total = (marg**2).sum() * 100.0
        rows, pair, xrow, xbz, xx = derived_bzx(t, f, lam)

        def viol(x, tgt):
            return (
                jnp.maximum(0.0, jnp.abs(x - tgt) - (0.5 - MARGIN)) ** 2
            ).sum()

        # the published B/Z/X rows do not follow the NCBI derivation
        # rules (the X-row term is infeasible jointly with the
        # marginals under both the odds- and score-average rules, and
        # the star row is a flat -9 unrelated to the block minimum of
        # -7), so only the 20x20 block + marginal consistency
        # constrain the chain; generated tables derive B/Z/X by the
        # documented score-average rule.
        del rows, pair, xrow, xbz, xx
        # regularize toward interval centers (determinism, tiny)
        total += 1e-6 * (p["u"] ** 2).sum()
        return total

    def terms(p):
        t = exact_scores(p)
        f = jax.nn.softmax(p["log_f"])
        lam = jnp.exp(p["log_lam"])
        marg = jnp.exp(lam * t) @ f - 1.0
        rows, pair, xrow, xbz, xx = derived_bzx(t, f, lam)

        def viol(x, tgt):
            return (
                jnp.maximum(0.0, jnp.abs(x - tgt) - (0.5 - MARGIN)) ** 2
            ).sum()

        return dict(
            marg=float((marg**2).sum() * 100.0),
            rows=float(viol(rows, tgt_rows)),
            pair=float(viol(pair, tgt_pair)),
            x=float(viol(xrow, tgt_x)),
            xbz=float(viol(xbz, tgt_xbz)),
            xx=float(viol(xx, tgt_xx)),
        )

    opt = optax.adam(2e-2)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    for step in range(30001):
        val, g = vg(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
        if step % 3000 == 0:
            print(f"step {step}: loss {float(val):.3e} {terms(params)}", flush=True)
            if float(val) < 1e-22:
                break

    t = np.asarray(exact_scores(params))
    f = np.asarray(jax.nn.softmax(params["log_f"]))
    lam = float(np.exp(params["log_lam"]))
    marg = np.abs(np.exp(lam * t) @ f - 1.0).max()
    print(f"lambda={lam:.6g} max-marginal-violation={marg:.3e}")
    print("freqs:", np.round(f, 4))

    # stage 2: generator = principal log of M(80)
    P = np.exp(lam * t) * f[:, None] * f[None, :]
    M80 = P / f[None, :]  # column-stochastic: M[i,j] = P(i|j)
    Q = scipy.linalg.logm(M80) / 80.0
    offdiag = Q - np.diag(np.diag(Q))
    neg = offdiag[offdiag < 0]
    print(
        f"generator off-diag: min {offdiag.min():.3e} "
        f"(|neg| mass {(-neg).sum():.3e} of {offdiag[offdiag > 0].sum():.3e})"
    )
    Qc = np.where(
        np.eye(20, dtype=bool), 0.0, np.maximum(offdiag, 0.0)
    )
    Qc = Qc - np.diag(Qc.sum(axis=0))

    # verify the cleaned generator still regenerates VTML80 bit-exactly
    M = scipy.linalg.expm(80.0 * Qc)
    r = M / f[:, None]
    r = np.sqrt(r * r.T)
    t80 = np.log(r) / lam
    got = np.floor(t80 + 0.5).astype(np.int64)
    bad = int((got != target[:20, :20].astype(np.int64)).sum())
    print(f"cleaned-chain 20x20 mismatches vs VTML80: {bad}")

    np.savez(
        "experiments/vtml_chain_fit2.npz",
        q=Qc,
        freqs=f,
        lam=lam,
        t_exact=t,
    )
    print("saved experiments/vtml_chain_fit2.npz")


if __name__ == "__main__":
    main()
