"""Shared per-pixel scoring math for the band kernels.

Three kernels (band_pipeline._expand_score_kernel, band_score's one- and
two-channel variants) evaluate the same two stages on VMEM-resident values;
keeping the math here means a calibration or numerics change lands in every
kernel at once.  Everything is trace-time function composition — the jaxpr
(and therefore the Mosaic lowering) is identical to the previously inlined
forms.
"""
import jax
import jax.numpy as jnp
import numpy as np

# masking clamp: reference clips D at 1e4 (pyfvvdp/fvvdp.py:595)
L4 = float(np.log2(1e4))


def table_interp_delta(rows, u, n_grid, shared_delta=False):
    """Piecewise-linear LUT lookup in telescoped delta form:

        s(u) = t[0] + sum_i (t[i+1] - t[i]) * clip(u - i, 0, 1)

    ``rows`` is a sequence of indexable table rows (one per channel); the
    per-knot clip is computed ONCE and shared by all rows — n-1 knots
    instead of n taps, and one clip per knot vs the hat form's
    sub/abs/rsub/max.  With ``shared_delta`` the second row is the first
    plus a scalar offset (the omega=5 temporal modulation factors out of
    the Daly CSF), halving the per-knot FMA count.
    """
    outs = [jnp.zeros_like(u) + r[0] for r in rows]
    active = outs[:1] if shared_delta else outs
    rows_a = rows[:1] if shared_delta else rows
    for i in range(n_grid - 1):
        c = jnp.clip(u - float(i), 0.0, 1.0)
        for k, r in enumerate(rows_a):
            active[k] = active[k] + (r[i + 1] - r[i]) * c
    if shared_delta:
        return [active[0]] + [active[0] + (r[0] - rows[0][0])
                              for r in rows[1:]]
    return active


def table_interp_delta_dyn(rows_ref, u, n_grid, n_rows, shared_delta=False):
    """Piecewise-linear LUT lookup over a DYNAMIC per-call knot window.

    Same telescoped delta form as :func:`table_interp_delta`, but the knot
    loop runs only over ``[floor(min u), ceil(max u))`` — the knots the tile
    actually reaches.  Natural content is locally narrow in background
    luminance, so a 64x256 strip typically spans 2-6 of the ~19 weightable
    knots; the static unrolled loop pays for all of them.  Exact: knots
    below the window contribute their full delta (folded into the t[i0]
    base term read directly from the table — 1 ulp BETTER than the
    accumulated prefix) and knots above it have exactly zero clip weight.

    ``rows_ref`` is an SMEM ref of shape (n_rows, n_grid) — the dynamic trip
    count needs dynamically-indexed scalar loads, which SMEM serves in one
    cycle where a VMEM lane-gather would not.  Returns one interpolated
    plane per row; with ``shared_delta`` rows 1+ are row 0 plus a scalar
    offset (see table_interp_delta).
    """
    # Flat clamp beyond the grid: the 2x-unrolled body below re-adds the
    # last delta for an overhang knot when u > n_grid-1, which would turn
    # the intended flat extrapolation into linear — clamp once (one vector
    # op outside the knot loop) instead of relying on every caller to.
    # NaN lanes pass through clip unchanged, keeping the containment below.
    u = jnp.clip(u, 0.0, float(n_grid - 1))
    # Window bounds only — a non-finite u lane (NaN luminance in user input)
    # must not poison the int window for the whole strip; the lane itself
    # still propagates NaN through the clip weights below, confining the
    # damage exactly as the static unrolled loop did.
    uf = jnp.where(jnp.isfinite(u), u, 0.0)
    i0 = jnp.clip(jnp.floor(jnp.min(uf)).astype(jnp.int32), 0, n_grid - 1)
    i1 = jnp.clip(jnp.ceil(jnp.max(uf)).astype(jnp.int32), 0, n_grid - 1)
    k_rows = 1 if shared_delta else n_rows
    # u * 0 (not zeros_like) keeps non-finite lanes NaN even when the knot
    # window collapses to zero trips (e.g. every lane non-finite)
    init = tuple(u * 0.0 + rows_ref[k, i0] for k in range(k_rows))

    def body(j, accs):
        # 2x unrolled: knot pairs halve the loop-carried scalar-load
        # serialization.  The possible overhang knot (odd trip count,
        # i == i1) is exact: its clip weight is 0 for every finite lane
        # (u <= i1), so the clamped in-bounds load value is irrelevant.
        iA = i0 + 2 * j
        iB = iA + 1
        iBc = jnp.minimum(iB, n_grid - 2)
        cA = jnp.clip(u - iA.astype(u.dtype), 0.0, 1.0)
        cB = jnp.clip(u - iB.astype(u.dtype), 0.0, 1.0)
        return tuple(accs[k]
                     + (rows_ref[k, iA + 1] - rows_ref[k, iA]) * cA
                     + (rows_ref[k, iBc + 1] - rows_ref[k, iBc]) * cB
                     for k in range(k_rows))

    outs = list(jax.lax.fori_loop(0, (i1 - i0 + 1) // 2, body, init))
    if shared_delta:
        outs += [outs[0] + (rows_ref[k, 0] - rows_ref[0, 0])
                 for k in range(1, n_rows)]
    return outs


def d_beta_log2(T, R, ls, p, q, lc10, beta):
    """Masked-difference term D^beta, evaluated in log2 space.

    The table holds log2-sensitivity, so S is never exponentiated:

        log2 D = p*(log2|T-R| + ls) - log2(1 + 2^(q*(log2 min(|T|,|R|) + ls + lc10)))
        D^beta = 2^(beta * min(log2 D, log2 1e4))

    — 5 transcendentals per channel pair vs 7 plus a divide for the direct
    form (log2(0) = -inf flows through to an exact 0, matching pow's
    D(0,0) = 0).  Same math as the reference: pyfvvdp/fvvdp.py:574-596.
    ``ls`` is the per-pixel log2 of the normalisation (sensitivity +
    correction, minus log2 L_bkg when contrast is un-normalised).
    """
    la = jnp.log2(jnp.abs(T - R)) + ls
    lm = jnp.log2(jnp.minimum(jnp.abs(T), jnp.abs(R))) + (ls + lc10)
    ld = p * la - jnp.log2(1.0 + jnp.exp2(q * lm))
    return jnp.exp2(beta * jnp.minimum(ld, L4))
