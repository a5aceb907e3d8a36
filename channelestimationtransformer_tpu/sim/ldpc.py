"""Quasi-cyclic LDPC encoder + normalized min-sum belief-propagation decoder.

Reference: the link sim's FEC is Sionna's 5G LDPC encoder/decoder
(``MimoSimulation/KerasFullSimulation.py:139-151``). This module supplies an
in-framework LDPC capability: an IEEE-802.11n-style **quasi-cyclic** code
(block-circulant parity-check matrix with a block-lower-triangular parity
part, so encoding is exact back-substitution), plus a **normalized min-sum**
iterative decoder. The construction is parameterized (lift size, rate, seed)
rather than the 3GPP BG1/BG2 tables — documented delta: same algorithm family
and decoder as 5G LDPC, different prototype matrix.

TPU-native design notes:

- The code is defined by a small integer prototype matrix; all GF(2) work is
  expressed as XOR/roll on ``[z]``-sized blocks (``jnp.roll`` = circulant
  shift), so encoding is a fixed sequence of rolls and XORs — fully jittable,
  no bit-packing loops.
- The decoder is edge-parallel: messages live on a static edge list; check
  updates use the two-min trick via ``jax.ops.segment_min`` and sign products
  via segment sums of sign bits; variable updates are ``segment_sum``s. A
  fixed ``num_iters`` ``lax.scan`` keeps shapes static (no early exit — on
  TPU the iterations are cheap and uniform).
- ``vmap`` over codewords batches the whole decode.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class QCLDPC:
    """A lifted quasi-cyclic code: prototype ``proto`` with entries -1 (zero
    block) or shift s in [0, z); H = [A | T] with T block-lower-triangular,
    identity diagonal."""

    proto: tuple  # [mb][nb] int tuple-of-tuples
    z: int

    @property
    def mb(self) -> int:
        return len(self.proto)

    @property
    def nb(self) -> int:
        return len(self.proto[0])

    @property
    def kb(self) -> int:
        return self.nb - self.mb

    @property
    def n(self) -> int:
        return self.nb * self.z

    @property
    def k(self) -> int:
        return self.kb * self.z


def make_qc_ldpc(z: int = 27, kb: int = 12, mb: int = 12, seed: int = 0,
                 row_weight: int = 6) -> QCLDPC:
    """Construct a rate kb/(kb+mb) QC-LDPC prototype.

    Information part A: ``row_weight`` random circulant shifts per block row
    with simple 4-cycle avoidance (no two columns may repeat a shift
    difference within a column pair). Parity part T: dual-diagonal-style
    block-lower-triangular with identity (shift 0) blocks on the diagonal and
    one sub-diagonal identity per row — exact back-substitution encoding.
    """
    rng = np.random.default_rng(seed)
    nb = kb + mb
    proto = -np.ones((mb, nb), dtype=np.int64)

    # Parity part: identity diagonal + sub-diagonal (bidiagonal T).
    for i in range(mb):
        proto[i, kb + i] = 0
        if i > 0:
            proto[i, kb + i - 1] = 0

    # Information part with 4-cycle avoidance between column pairs.
    # diff[(c1, c2)] = set of (s1 - s2) mod z seen for rows covering both.
    diffs: dict = {}
    for i in range(mb):
        cols = rng.choice(kb, size=min(row_weight, kb), replace=False)
        for c in cols:
            for _ in range(50):  # rejection sampling for girth > 4
                s = int(rng.integers(0, z))
                ok = True
                for c2 in range(kb):
                    if c2 == c or proto[i, c2] < 0:
                        continue
                    d = (s - proto[i, c2]) % z
                    key = (min(c, c2), max(c, c2))
                    dset = diffs.setdefault(key, set())
                    dd = d if c < c2 else (-d) % z
                    if dd in dset:
                        ok = False
                        break
                if ok:
                    proto[i, c] = s
                    for c2 in range(kb):
                        if c2 == c or proto[i, c2] < 0:
                            continue
                        d = (s - proto[i, c2]) % z
                        key = (min(c, c2), max(c, c2))
                        dd = d if c < c2 else (-d) % z
                        diffs.setdefault(key, set()).add(dd)
                    break
    return QCLDPC(proto=tuple(tuple(int(v) for v in row) for row in proto), z=z)


def ldpc_encode(code: QCLDPC, info_bits: jnp.ndarray) -> jnp.ndarray:
    """Systematic encoding: ``info_bits`` int [..., k] -> codeword [..., n].

    Solves A u + T p = 0 over GF(2) by block back-substitution (T is
    block-bidiagonal with identity diagonal): p_i = sum_j rot(u_j, s_ij)
    xor p_{i-1}.
    """
    z, kb, mb = code.z, code.kb, code.mb
    u = info_bits.reshape(*info_bits.shape[:-1], kb, z)

    def row_syndrome(i):
        acc = jnp.zeros(u.shape[:-2] + (z,), info_bits.dtype)
        for j in range(kb):
            s = code.proto[i][j]
            if s >= 0:
                # circulant block: H_block @ u_j == roll(u_j, -s)
                acc = acc ^ jnp.roll(u[..., j, :], -s, axis=-1)
        return acc

    parts = []
    prev = jnp.zeros(u.shape[:-2] + (z,), info_bits.dtype)
    for i in range(mb):
        p_i = row_syndrome(i) ^ prev  # T identity diag, sub-diag identity
        parts.append(p_i)
        prev = p_i
    p = jnp.stack(parts, axis=-2)
    return jnp.concatenate(
        [u.reshape(*info_bits.shape[:-1], kb * z),
         p.reshape(*info_bits.shape[:-1], mb * z)], axis=-1
    )


def _edge_list(code: QCLDPC):
    """Static (check_idx, var_idx) arrays for every 1 in the lifted H."""
    checks, vars_ = [], []
    z = code.z
    for i, row in enumerate(code.proto):
        for j, s in enumerate(row):
            if s < 0:
                continue
            for r in range(z):
                checks.append(i * z + r)
                vars_.append(j * z + (r + s) % z)
    return np.asarray(checks), np.asarray(vars_)


@partial(jax.jit, static_argnames=("code", "num_iters", "alpha"))
def ldpc_decode(code: QCLDPC, llr: jnp.ndarray, num_iters: int = 25,
                alpha: float = 0.75) -> jnp.ndarray:
    """Normalized min-sum decoding.

    ``llr``: float [..., n], positive favors bit 0 (matches
    :func:`.qam.qam_llr`). Returns hard-decision info bits int [..., k].
    """
    checks_np, vars_np = _edge_list(code)
    checks = jnp.asarray(checks_np)
    vars_ = jnp.asarray(vars_np)
    n_checks = code.mb * code.z
    n_vars = code.n
    n_edges = checks.shape[0]

    lead = llr.shape[:-1]
    flat = llr.reshape(-1, n_vars)

    def decode_one(chan):
        def bp_iter(v2c, _):
            # --- check update (two-min trick + sign product) ---
            mag = jnp.abs(v2c)
            sgn = jnp.where(v2c < 0, 1, 0)
            # total sign per check (parity of negatives)
            s_tot = jax.ops.segment_sum(sgn, checks, num_segments=n_checks) % 2
            # first and second minima per check
            m1 = jax.ops.segment_min(mag, checks, num_segments=n_checks)
            is_min = mag <= m1[checks]
            big = jnp.where(is_min, jnp.inf, mag)
            m2 = jax.ops.segment_min(big, checks, num_segments=n_checks)
            # outgoing magnitude: excluding self. Non-min edges see m1; a
            # UNIQUE min edge sees m2; tied-min edges see m1 (the other tie).
            cnt = jax.ops.segment_sum(
                is_min.astype(jnp.int32), checks, num_segments=n_checks
            )
            out_mag = jnp.where(
                is_min & (cnt[checks] == 1), m2[checks], m1[checks]
            )
            # outgoing sign: total parity minus own sign
            out_sgn = (s_tot[checks] + sgn) % 2
            c2v = alpha * jnp.where(out_sgn == 1, -out_mag, out_mag)
            c2v = jnp.where(jnp.isfinite(c2v), c2v, 0.0)

            # --- variable update ---
            v_tot = chan + jax.ops.segment_sum(c2v, vars_, num_segments=n_vars)
            v2c_new = v_tot[vars_] - c2v
            return v2c_new, None

        v2c0 = chan[vars_]
        v2c, _ = jax.lax.scan(bp_iter, v2c0, None, length=num_iters)
        # final posterior
        # re-run one check update to get c2v from the final v2c
        mag = jnp.abs(v2c)
        sgn = jnp.where(v2c < 0, 1, 0)
        s_tot = jax.ops.segment_sum(sgn, checks, num_segments=n_checks) % 2
        m1 = jax.ops.segment_min(mag, checks, num_segments=n_checks)
        is_min = mag <= m1[checks]
        big = jnp.where(is_min, jnp.inf, mag)
        m2 = jax.ops.segment_min(big, checks, num_segments=n_checks)
        cnt = jax.ops.segment_sum(
            is_min.astype(jnp.int32), checks, num_segments=n_checks
        )
        out_mag = jnp.where(is_min & (cnt[checks] == 1), m2[checks], m1[checks])
        out_sgn = (s_tot[checks] + sgn) % 2
        c2v = alpha * jnp.where(out_sgn == 1, -out_mag, out_mag)
        c2v = jnp.where(jnp.isfinite(c2v), c2v, 0.0)
        posterior = chan + jax.ops.segment_sum(c2v, vars_, num_segments=n_vars)
        return (posterior < 0).astype(jnp.int32)

    hard = jax.vmap(decode_one)(flat)
    return hard.reshape(*lead, n_vars)[..., : code.k]


def ldpc_syndrome(code: QCLDPC, codeword: jnp.ndarray) -> jnp.ndarray:
    """H @ c mod 2 (all-zero iff ``codeword`` is valid) — test/debug helper."""
    checks_np, vars_np = _edge_list(code)
    flat = codeword.reshape(-1, code.n)
    syn = jax.vmap(
        lambda c: jax.ops.segment_sum(
            c[jnp.asarray(vars_np)], jnp.asarray(checks_np),
            num_segments=code.mb * code.z,
        ) % 2
    )(flat)
    return syn.reshape(*codeword.shape[:-1], code.mb * code.z)
