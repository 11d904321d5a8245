"""Fit the VT (Mueller-Vingron) evolutionary chain to the VTML80 anchor.

Same method as the PAM fit (fit_pam2.py) with three differences forced
by the single anchor: the stationary frequencies and the score scale
(lambda) are free parameters (Dayhoff's values don't apply, and the
published VTML frequency vector is not available offline), and the
chain is parametrized by its *generator* (continuous-time rate matrix)
so distances extrapolate by matrix exponential, exactly the
variable-time construction of Mueller & Vingron (2000).

Parameters: symmetric generator flux psi (20x20 upper), log
frequencies, log lambda.  The generator is calibrated so one distance
unit = 1% expected substitutions (the PAM convention VTML inherits).
Feasibility target: every integer of the published VTML80 table
(transcribed in pyopal_tpu/matrices.py, incl. B/Z/X rows under the
odds-mixture rule that fit_pam2 proved for the NCBI tables) pins the
chain's exact distance-80 log-odds into the half-unit rounding
interval.

Run:  JAX_PLATFORMS=cpu python experiments/fit_vtml.py [odds|score]
Writes experiments/vtml_chain_fit.npz on a feasible fit.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

from pyopal_tpu import ScoringMatrix

AA = "ARNDCQEGHILKMFPSTWYV"
LN2 = float(np.log(2.0))


def generator(psi_log, log_f):
    f = jax.nn.softmax(log_f)
    psi = jnp.exp(psi_log)
    psi = (psi + psi.T) / 2.0
    psi = psi * (1.0 - jnp.eye(20))
    q = psi / f[None, :]
    q = q - jnp.diag(q.sum(axis=0))
    # calibrate: one distance unit = 1% expected substitutions
    rate = -(f * jnp.diag(q)).sum()
    return q / (100.0 * rate), f


def scores23(q, n, lam, f, wB, wZ, bz_rule):
    mn = jax.scipy.linalg.expm(n * q)
    r = mn / f[:, None]
    r = jnp.sqrt(r * r.T)
    t = jnp.log(r) / lam
    if bz_rule == "odds":
        wbz = jnp.stack([wB, wZ])
        rows = jnp.log(wbz @ r) / lam
        pair = jnp.log(wbz @ r @ wbz.T) / lam
    else:
        wbz = jnp.stack([wB, wZ])
        rows = wbz @ t
        pair = wbz @ t @ wbz.T
    full = jnp.zeros((23, 23))
    full = full.at[:20, :20].set(t)
    full = full.at[20:22, :20].set(rows)
    full = full.at[:20, 20:22].set(rows.T)
    full = full.at[20:22, 20:22].set(pair)
    xrow = f @ t
    full = full.at[22, :20].set(xrow)
    full = full.at[:20, 22].set(xrow)
    full = full.at[22, 20:22].set(wbz @ xrow)
    full = full.at[20:22, 22].set(wbz @ xrow)
    full = full.at[22, 22].set(f @ t @ f)
    return full


def group_weights(f):
    wB = jnp.zeros(20).at[jnp.asarray([AA.index("N"), AA.index("D")])].set(
        f[jnp.asarray([AA.index("N"), AA.index("D")])]
    )
    wZ = jnp.zeros(20).at[jnp.asarray([AA.index("Q"), AA.index("E")])].set(
        f[jnp.asarray([AA.index("Q"), AA.index("E")])]
    )
    return wB / wB.sum(), wZ / wZ.sum()


def main(bz_rule="odds"):
    target = ScoringMatrix.from_name("VTML80").data.astype(np.float64)[
        :23, :23
    ]
    target_j = jnp.asarray(target)
    refs = target.astype(np.int64)

    # init: BLOSUM-ish frequencies, a generic exchangeability guess
    f0 = np.full(20, 0.05)
    rng = np.random.default_rng(0)
    psi0 = np.log(np.full((20, 20), 2.5e-4) * (1 + 0.1 * rng.random((20, 20))))
    params = {
        "psi_log": jnp.asarray(psi0),
        "log_f": jnp.asarray(np.log(f0)),
        "log_lam": jnp.asarray(np.log(LN2 / 3.0)),
    }
    margin = 0.02

    def loss_fn(p):
        q, f = generator(p["psi_log"], p["log_f"])
        lam = jnp.exp(p["log_lam"])
        wB, wZ = group_weights(f)
        t = scores23(q, 80.0, lam, f, wB, wZ, bz_rule)
        viol = jnp.maximum(0.0, jnp.abs(t - target_j) - (0.5 - margin))
        total = (viol**2).sum()
        # keep the chain sane: diagonal of M(1) near 1
        m1 = jax.scipy.linalg.expm(q)
        total = total + (jnp.maximum(0.0, 0.95 - jnp.diag(m1)) ** 2).sum()
        return total

    opt = optax.adam(5e-3)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    for step in range(60001):
        val, g = vg(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
        if step % 4000 == 0:
            q, f = generator(params["psi_log"], params["log_f"])
            lam = jnp.exp(params["log_lam"])
            wB, wZ = group_weights(f)
            t = np.asarray(scores23(q, 80.0, lam, f, wB, wZ, bz_rule))
            got = np.floor(t + 0.5).astype(np.int64)
            bad = got != refs
            print(
                f"step {step}: loss {float(val):.6g} mismatches "
                f"20x20={int(bad[:20, :20].sum())} "
                f"BZX={int(bad.sum() - bad[:20, :20].sum())}",
                flush=True,
            )
            if float(val) == 0.0 and not bad.any():
                break

    q, f = generator(params["psi_log"], params["log_f"])
    lam = float(jnp.exp(params["log_lam"]))
    np.savez(
        "experiments/vtml_chain_fit.npz",
        q=np.asarray(q),
        freqs=np.asarray(f),
        lam=lam,
        bz_rule=bz_rule,
    )
    print(f"saved experiments/vtml_chain_fit.npz (lambda={lam:.6g})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "odds")
