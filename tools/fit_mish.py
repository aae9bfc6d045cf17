"""Fit a minimax-ish rational approximation to h(x) = tanh(softplus(x)).

mish(x) = x * h(x). The reference computes h via exp -> log1p -> tanh
(three transcendental lowerings, each itself a polynomial/rational chain on
the TPU VPU). A single rational P(s)/Q(s) over a clamped domain evaluates in
~2*deg FMAs + one divide — the same cost class as ONE tanh lowering.

Method: Chebyshev-basis linearized least squares (P - h*Q = 0 weighted by
1/Q_prev, a.k.a. the SK iteration) plus Lawson reweighting toward the
minimax solution; endpoint pinning so the clamp continuation is continuous.

Outputs monomial coefficients in the scaled variable s = (x - C) / W,
ready to paste into ops/activations.py, plus an error report over the fit
domain and over every finite bf16 value (the actual mish input domain in
mixed-precision training).
"""

import numpy as np

LO, HI = -12.0, 9.0
C = (HI + LO) / 2.0          # -1.5
W = (HI - LO) / 2.0          # 10.5
DEG_P = 8
DEG_Q = 8
NPTS = 4001


def h_exact(x):
    x = np.asarray(x, np.float64)
    sp = np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)   # stable softplus
    return np.tanh(sp)


def fit(rel_floor=None):
    # Chebyshev nodes in s
    k = np.arange(NPTS)
    s = np.cos(np.pi * (k + 0.5) / NPTS)
    x = C + W * s
    y = h_exact(x)

    TP = np.polynomial.chebyshev.chebvander(s, DEG_P)
    TQ = np.polynomial.chebyshev.chebvander(s, DEG_Q)

    # rel_floor: minimax on err / max(h, rel_floor) instead of abs err —
    # buys relative accuracy where h is tiny (very negative x) at the cost
    # of a larger absolute error near the top of the range.
    base_w = np.ones(NPTS) if rel_floor is None else 1.0 / np.maximum(y, rel_floor)
    w = base_w.copy()
    q_prev = np.ones(NPTS)
    p = None
    for it in range(60):
        # Solve [TP, -y*TQ[:,1:]] [p; q1..] = y * TQ[:,0]  with q0 = 1,
        # rows weighted by w / |Q_prev|
        A = np.hstack([TP, -(y[:, None]) * TQ[:, 1:]])
        b = y * TQ[:, 0]
        ww = w / np.maximum(np.abs(q_prev), 1e-9)
        sol, *_ = np.linalg.lstsq(A * ww[:, None], b * ww, rcond=None)
        p = sol[:DEG_P + 1]
        q = np.concatenate([[1.0], sol[DEG_P + 1:]])
        q_prev = TQ @ q
        approx = (TP @ p) / q_prev
        err = (approx - y) * base_w
        # Lawson: push weight onto the current worst (weighted) points
        w *= np.sqrt(np.abs(err) + 1e-16)
        w /= w.max()
        if it % 10 == 9:
            print(f"  it {it}: max weighted err {np.max(np.abs(err)):.3e}")
    return p, q


def to_monomial(coefs_cheb):
    return np.polynomial.chebyshev.cheb2poly(coefs_cheb)


def report(p_mono, q_mono):
    def h_approx64(x):
        s = (np.asarray(x, np.float64) - C) / W
        s = np.clip(s, -1.0, 1.0)
        num = np.polynomial.polynomial.polyval(s, p_mono)
        den = np.polynomial.polynomial.polyval(s, q_mono)
        return num / den

    xs = np.linspace(LO, HI, 200001)
    err = h_approx64(xs) - h_exact(xs)
    print(f"fit-domain max |h_err|  : {np.max(np.abs(err)):.3e}")
    merr = xs * err
    print(f"fit-domain max |mish_err|: {np.max(np.abs(merr)):.3e}")

    # Exhaustive bf16 domain check, f32 evaluation (what the TPU computes)
    import jax.numpy as jnp
    bits = np.arange(1 << 16, dtype=np.uint32) << 16
    allf = bits.view(np.float32)
    finite = np.isfinite(allf)
    xb = allf[finite].astype(np.float64)
    # reference: f32-internal mish, rounded to bf16
    ref = (xb * h_exact(xb))
    ref_bf = jnp.asarray(ref, jnp.float32).astype(jnp.bfloat16)

    # candidate, evaluated in f32 like the kernel will
    s = np.clip((xb - C) / W, -1.0, 1.0).astype(np.float32)
    num = np.zeros_like(s)
    for c in p_mono[::-1]:
        num = num * s + np.float32(c)
    den = np.zeros_like(s)
    for c in q_mono[::-1]:
        den = den * s + np.float32(c)
    hh = num / den
    # continuation outside the clamp: y = x * R(clamped s)
    cand = (xb.astype(np.float32) * hh)
    # exact-linear branch for x >= HI (h == 1 to 1.5e-8 there) and the
    # zero tail for x < LO (|mish| < 7.4e-5 there, -> 0 as x -> -inf;
    # without this the clamp continuation x*R(-1) grows linearly)
    cand = np.where(xb >= HI, xb.astype(np.float32), cand)
    cand = np.where(xb < LO, np.float32(0.0), cand)
    cand_bf = jnp.asarray(cand, jnp.float32).astype(jnp.bfloat16)

    same = np.asarray(cand_bf == ref_bf)
    ulp = np.abs(np.asarray(cand_bf, np.float64) - np.asarray(ref_bf, np.float64))
    print(f"bf16 domain: {finite.sum()} finite values, "
          f"{same.mean() * 100:.4f}% bit-identical")
    bad = ~same
    if bad.any():
        xb_bad = xb[bad]
        print(f"  mismatches: {bad.sum()}  x-range [{xb_bad.min():.3g}, "
              f"{xb_bad.max():.3g}]  max abs dev "
              f"{np.max(ulp[bad]):.3e}")
        in_core = bad & (xb >= -9) & (xb <= HI)
        print(f"  mismatches with x in [-9, {HI}]: {in_core.sum()}")


def main():
    for rel_floor in (None, 3e-3, 1e-3, 3e-4):
        print(f"\n==== rel_floor = {rel_floor} ====")
        p_cheb, q_cheb = fit(rel_floor)
        p_mono = to_monomial(p_cheb)
        q_mono = to_monomial(q_cheb)
        print("# s = (x - C)/W, C=%.1f W=%.1f  — monomial coeffs, low->high"
              % (C, W))
        print("P =", repr([float(f"{c:.9e}") for c in p_mono]))
        print("Q =", repr([float(f"{c:.9e}") for c in q_mono]))
        report(p_mono, q_mono)


if __name__ == "__main__":
    main()
