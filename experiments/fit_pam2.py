"""Hypothesis search for the NCBI PAM ambiguity-row (B/Z/X) convention.

Builds on fit_pam.py: the 20x20 block of a reversible chain is fitted
so every published integer score pins its exact log-odds into the
half-unit rounding interval.  Here the B/Z/X rows are added under a
candidate construction rule; if the joint constraint set is feasible
(loss -> 0, zero mismatches over all four tables' full 23x23), the rule
is the one the published tables used.

Rules tried for B/Z (group = {N,D} / {Q,E}), per table:
  odds : score(B,j) = log(sum_a w_a odds(a,j)) / lambda
  score: score(B,j) = sum_a w_a score(a,j)
X always score-averaged over the 20 residues (odds-averaging forces
X ~ 0 because the frequencies are stationary, contradicting the
published negative X rows).

Run:  JAX_PLATFORMS=cpu python experiments/fit_pam2.py odds|score
"""

import sys

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import optax

from pyopal_tpu import ScoringMatrix

import gen_pam

AA = gen_pam.AA
LN2 = float(np.log(2.0))
FREQS = np.array([gen_pam.FREQ[a] for a in AA])
FREQS = FREQS / FREQS.sum()

TABLES = [
    ("PAM30", 30, LN2 / 2),
    ("PAM70", 70, LN2 / 2),
    ("PAM120", 120, LN2 / 2),
    ("PAM250", 250, LN2 / 3),
]


def chain_from_flux(log_phi, f):
    phi = jnp.exp(log_phi)
    phi = (phi + phi.T) / 2.0
    phi = phi * (1.0 - jnp.eye(20))
    m = phi / f[None, :]
    return m + jnp.diag(1.0 - m.sum(axis=0))


def group_weights(f):
    wB = np.zeros(20)
    wB[[AA.index("N"), AA.index("D")]] = f[[AA.index("N"), AA.index("D")]]
    wZ = np.zeros(20)
    wZ[[AA.index("Q"), AA.index("E")]] = f[[AA.index("Q"), AA.index("E")]]
    wB, wZ = wB / wB.sum(), wZ / wZ.sum()
    return jnp.asarray(wB), jnp.asarray(wZ)


def scores23(m1, n, lam, f, wB, wZ, bz_rule):
    mn = jnp.linalg.matrix_power(m1, n)
    r = mn / f[:, None]
    r = jnp.sqrt(r * r.T)  # symmetric odds
    t = jnp.log(r) / lam  # exact 20x20 scores
    if bz_rule == "odds":
        # extend the odds matrix by mixture rows/cols, then take logs
        wbz = jnp.stack([wB, wZ])  # (2, 20)
        rows = wbz @ r  # (2, 20)
        pair = wbz @ r @ wbz.T  # (2, 2)
        tB, tZ = jnp.log(rows) / lam
        tBB = jnp.log(pair[0, 0]) / lam
        tBZ = jnp.log(pair[0, 1]) / lam
        tZZ = jnp.log(pair[1, 1]) / lam
    else:
        wbz = jnp.stack([wB, wZ])
        rows = wbz @ t
        pair = wbz @ t @ wbz.T
        tB, tZ = rows
        tBB, tBZ, tZZ = pair[0, 0], pair[0, 1], pair[1, 1]
    # X: frequency-weighted average of exact scores, including the
    # B/Z columns once extended
    full = jnp.zeros((23, 23))
    full = full.at[:20, :20].set(t)
    full = full.at[20, :20].set(tB)
    full = full.at[:20, 20].set(tB)
    full = full.at[21, :20].set(tZ)
    full = full.at[:20, 21].set(tZ)
    full = full.at[20, 20].set(tBB)
    full = full.at[20, 21].set(tBZ)
    full = full.at[21, 20].set(tBZ)
    full = full.at[21, 21].set(tZZ)
    fx = jnp.asarray(FREQS)
    xrow20 = fx @ t  # (20,)
    # X-vs-B/Z: the B/Z mixture applied to the X *column* of exact
    # scores (score-average over the group), not the X mixture over
    # the B/Z column
    xB = wB @ xrow20
    xZ = wZ @ xrow20
    xx = fx @ t @ fx
    full = full.at[22, :20].set(xrow20)
    full = full.at[:20, 22].set(xrow20)
    full = full.at[22, 20].set(xB)
    full = full.at[20, 22].set(xB)
    full = full.at[22, 21].set(xZ)
    full = full.at[21, 22].set(xZ)
    full = full.at[22, 22].set(xx)
    return full


def main(bz_rule):
    targets = []
    refs = {}
    for name, n, lam in TABLES:
        s = ScoringMatrix.from_name(name).data.astype(np.float64)[:23, :23]
        targets.append((n, lam, jnp.asarray(s)))
        refs[name] = s.astype(np.int64)

    f = jnp.asarray(FREQS)
    wB, wZ = group_weights(FREQS)

    m0 = gen_pam.parse_pam1()
    phi0 = np.maximum(m0 * FREQS[None, :], 1e-9)
    phi0 = np.sqrt(phi0 * phi0.T)
    log_phi = jnp.asarray(np.log(phi0))

    margin = 0.02

    def loss_fn(lp):
        m1 = chain_from_flux(lp, f)
        total = 0.0
        for n, lam, s in targets:
            t = scores23(m1, n, lam, f, wB, wZ, bz_rule)
            viol = jnp.maximum(0.0, jnp.abs(t - s) - (0.5 - margin))
            total = total + (viol ** 2).sum()
        total = total + (
            jnp.maximum(0.0, 0.9 - jnp.diag(m1)) ** 2
        ).sum() * 10.0
        return total

    opt = optax.adam(3e-3)
    state = opt.init(log_phi)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    for step in range(40001):
        val, g = vg(log_phi)
        upd, state = opt.update(g, state)
        log_phi = optax.apply_updates(log_phi, upd)
        if step % 4000 == 0:
            m1 = chain_from_flux(log_phi, f)
            msg = {}
            for name, n, lam in TABLES:
                t = np.asarray(scores23(m1, n, lam, f, wB, wZ, bz_rule))
                got = np.floor(t + 0.5).astype(np.int64)
                bad = got != refs[name]
                msg[name] = (
                    f"{int(bad[:20, :20].sum())}|"
                    f"{int(bad[20, :20].sum())}|"
                    f"{int(bad[21, :20].sum())}|"
                    f"{int(bad[22, :20].sum())}|"
                    f"{int(bad[20:, 20:].sum())}"
                )
            print(f"step {step}: loss {float(val):.6g} "
                  f"[20x20|B|Z|X|pair] {msg}", flush=True)
            if float(val) == 0.0:
                break

    m1 = np.asarray(chain_from_flux(log_phi, f))
    np.savez(f"experiments/pam_chain_fit_{bz_rule}.npz", m1=m1,
             freqs=np.asarray(FREQS))
    print(f"saved experiments/pam_chain_fit_{bz_rule}.npz")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "odds")
