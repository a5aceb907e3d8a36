"""Channel coding for the end-to-end link: convolutional FEC + Viterbi.

The reference's link simulation uses Sionna's 5G LDPC encoder/decoder
(reference ``MimoSimulation/KerasFullSimulation.py:117-241``, LDPC5GEncoder /
LDPC5GDecoder blocks). Re-implementing the full 5G LDPC base graphs is out of
scope per the build plan (SURVEY §7.2 step 10: "start uncoded or with a simple
convolutional code, and document the delta"); this module supplies the
in-framework FEC: the standard K=7, rate-1/2 convolutional code
(generators 133/171 octal) with a soft-input Viterbi decoder.

TPU-native design: the encoder is a *table lookup over bit windows* (no
sequential register loop — the 7-bit window sequence is formed by stacked
shifts and the two parity outputs come from a 128-entry parity table), and the
Viterbi decoder is a ``lax.scan`` over time with the 64-state
add-compare-select fully vectorized (one [64]-lane max per step — VPU-friendly,
static shapes, jittable end to end). Traceback is a second (reversed) scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

K = 7  # constraint length
N_STATES = 1 << (K - 1)  # 64
G = (0o133, 0o171)  # generator polynomials; newest bit = LSB of the window


def _parity_table(g: int) -> np.ndarray:
    """parity(window & g) for every 7-bit window value."""
    vals = np.arange(1 << K)
    return np.array([bin(v & g).count("1") & 1 for v in vals], dtype=np.int32)


_PARITY = np.stack([_parity_table(g) for g in G])  # [2, 128]

# Trellis tables: full = (state << 1) | bit (7 bits); next = full & 63.
_FULL = (np.arange(N_STATES)[:, None] << 1) | np.arange(2)[None, :]  # [64, 2]
_NEXT_STATE = _FULL & (N_STATES - 1)  # [64, 2]
_OUT = _PARITY[:, _FULL]  # [2, 64, 2]: coded bits (c0, c1) per (state, input)


def conv_encode(bits: jnp.ndarray) -> jnp.ndarray:
    """Rate-1/2 convolutional encoding with K-1 terminating zero-tail.

    ``bits``: int [..., n] in {0, 1}. Returns int [..., 2*(n + K - 1)] coded
    bits (the tail drives the register back to state 0 so the decoder can
    terminate its traceback there).
    """
    n = bits.shape[-1]
    tail = jnp.zeros((*bits.shape[:-1], K - 1), bits.dtype)
    b = jnp.concatenate([bits, tail], axis=-1)
    # 7-bit windows [b_t, b_{t-1}, ..., b_{t-6}] as an integer index.
    padded = jnp.concatenate([jnp.zeros((*b.shape[:-1], K - 1), b.dtype), b], axis=-1)
    # window value must equal the trellis ``full = (state << 1) | bit``:
    # newest bit at the LSB, oldest (b_{t-6}) at bit K-1.
    weights = jnp.asarray([1 << (K - 1 - i) for i in range(K)])  # i=0 oldest
    windows = jnp.stack(
        [padded[..., i : i + n + K - 1] for i in range(K)], axis=-1
    )  # [..., n+K-1, K] ordered oldest->newest
    idx = jnp.sum(windows * weights, axis=-1)  # [..., n+K-1]
    table = jnp.asarray(_PARITY)  # [2, 128]
    c = table[:, idx]  # [2, ..., n+K-1]
    c = jnp.moveaxis(c, 0, -1)  # [..., n+K-1, 2]
    return c.reshape(*bits.shape[:-1], -1)


@partial(jax.jit, static_argnames=("num_bits",))
def viterbi_decode(llr: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """Soft-input Viterbi decoding of :func:`conv_encode` output.

    ``llr``: float [..., 2*(num_bits + K - 1)] log-likelihood ratios with the
    convention ``llr > 0`` favors bit 0 (llr = log p(0)/p(1)), matching
    :func:`..sim.qam.qam_llr`. Returns int [..., num_bits] decoded bits.
    """
    lead = llr.shape[:-1]
    steps = num_bits + K - 1
    llr2 = llr.reshape(*lead, steps, 2)
    flat = llr2.reshape(-1, steps, 2)

    # out01[c] = +1 where coded bit c is 0 (sign convention of the llr).
    out01 = jnp.asarray(1 - 2 * np.moveaxis(_OUT, 0, -1), jnp.float32)  # [64, 2, 2]

    def decode_one(l):
        def acs(pm, l_t):
            # branch metric for (state, input): correlate expected ±1 with llr
            bm = jnp.einsum("sbc,c->sb", out01, l_t) * 0.5  # [64, 2]
            # per-successor state s' the two incoming edges come from
            # p0 = s'>>1 (d=0) and p1 = p0|32 (d=1), consuming input bit
            # b = lsb(s') — gather beats scatter on TPU.
            p0 = jnp.arange(N_STATES) >> 1
            p1 = p0 | (1 << (K - 2))
            b = jnp.arange(N_STATES) & 1
            m0 = pm[p0] + bm[p0, b]
            m1 = pm[p1] + bm[p1, b]
            d = (m1 > m0).astype(jnp.int32)
            new_pm = jnp.where(d == 1, m1, m0)
            new_pm = new_pm - jnp.max(new_pm)  # renormalize (metric drift)
            return new_pm, d

        pm0 = jnp.full((N_STATES,), -jnp.inf).at[0].set(0.0)
        _, decisions = jax.lax.scan(acs, pm0, l)  # [steps, 64]

        def back(state, d_t):
            b = state & 1
            prev = (state >> 1) | (d_t[state] << (K - 2))
            return prev, b

        # Tail termination: final state is 0.
        _, bits_rev = jax.lax.scan(back, 0, decisions, reverse=True)
        return bits_rev[:num_bits]

    decoded = jax.vmap(decode_one)(flat)
    return decoded.reshape(*lead, num_bits)


def coded_rate() -> float:
    """Effective code rate including the zero-tail."""
    return 0.5
