"""End-to-end MIMO link simulation: bits -> QAM -> precode -> channel -> AWGN
-> equalize -> demap -> BER.

Reference: ``MimoSimulation/KerasFullSimulation.py:243-317`` (Sionna Keras
model: LDPC + QAM + ZF precoding + LS/perfect CSI + LMMSE + BER via ``sim_ber``)
and ``MimoSimulation/Predict.py:88-135`` (channel-predictor-in-the-loop).

Differences, documented per SURVEY §7.2 step 10: the link here is uncoded
(no LDPC — the reference relies on Sionna's; coded BER can be layered on) and
frequency-flat (the reference's ``fft_size=1`` datasets are flat too). The
whole Monte-Carlo BER loop is one jitted program with RNG keys.

The interesting capability is :func:`simulate_ber` with ``h_precode != h_true``:
precoding on a *predicted* channel while transmitting over the true one —
quantifying what channel-prediction NMSE costs in BER, which is exactly the
reference's end-to-end question.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .estimation import lmmse_equalize
from .precoding import _as_complex, zf_precoder
from .qam import qam_demap_hard, qam_map


@dataclasses.dataclass(frozen=True)
class LinkConfig:
    qam_order: int = 4
    n_streams: int = 2  # spatial streams (== UE antennas here)


@partial(jax.jit, static_argnames=("cfg", "num_symbols"))
def simulate_ber(
    key: jax.Array,
    h_true: jnp.ndarray,
    h_precode: jnp.ndarray,
    ebno_db,
    cfg: LinkConfig = LinkConfig(),
    num_symbols: int = 64,
):
    """Monte-Carlo BER for a batch of channels.

    Args:
      h_true:    ``[B, n_rx, n_tx]`` actual channel during data transmission.
      h_precode: ``[B, n_rx, n_tx]`` channel used to compute the ZF precoder
                 (pass ``h_true`` for perfect CSI; pass a predictor's output
                 for the prediction-in-the-loop BER).
      ebno_db:   per-bit SNR in dB.
      num_symbols: QAM symbols per stream per channel realization.

    Returns: (ber, bits_total) — bit error rate and count.
    """
    import numpy as np

    h_true = _as_complex(h_true)
    h_precode = _as_complex(h_precode)
    b = h_true.shape[0]
    bps = int(np.log2(cfg.qam_order))
    n_bits = cfg.n_streams * num_symbols * bps

    k_bits, k_noise = jax.random.split(key)
    bits = jax.random.bernoulli(k_bits, 0.5, (b, n_bits)).astype(jnp.float32)

    # Map to symbols per stream: [B, n_streams, num_symbols].
    syms = qam_map(bits, cfg.qam_order).reshape(b, cfg.n_streams, num_symbols)

    # ZF precode on the (possibly predicted) channel.
    p = zf_precoder(h_precode)  # [B, n_tx, n_rx(=streams)]
    x = jnp.einsum("bts,bsn->btn", p, syms)  # [B, n_tx, num_symbols]

    # True channel + AWGN. Es/N0 = Eb/N0 * bps (unit-energy constellation).
    y = jnp.einsum("brt,btn->brn", h_true, x)
    esno = 10.0 ** (jnp.asarray(ebno_db) / 10.0) * bps
    # Noise power per rx: signal power spread over streams; precoder is unit
    # power so symbol energy at TX is ~1/n_streams per stream.
    noise_var = 1.0 / esno
    kr, ki = jax.random.split(k_noise)
    noise = jnp.sqrt(noise_var / 2) * (
        jax.random.normal(kr, y.shape) + 1j * jax.random.normal(ki, y.shape)
    )
    y = y + noise

    # LMMSE equalization with the effective channel h_true @ p.
    h_eff = h_true @ p  # [B, n_rx, n_streams]
    y_t = jnp.swapaxes(y, 1, 2)  # [B, num_symbols, n_rx]
    x_hat = jax.vmap(lambda yy, hh: lmmse_equalize(yy, hh, noise_var))(
        y_t, h_eff
    )  # [B, num_symbols, n_streams]
    x_hat = jnp.swapaxes(x_hat, 1, 2).reshape(b, cfg.n_streams * num_symbols)

    bits_hat = qam_demap_hard(x_hat, cfg.qam_order).reshape(b, n_bits)
    errors = jnp.sum(jnp.abs(bits_hat - bits))
    return errors / (b * n_bits), b * n_bits


@partial(jax.jit, static_argnames=("cfg", "num_symbols", "fec"))
def simulate_coded_ber(
    key: jax.Array,
    h_true: jnp.ndarray,
    h_precode: jnp.ndarray,
    ebno_db,
    cfg: LinkConfig = LinkConfig(),
    num_symbols: int = 64,
    fec: str = "conv",
):
    """Coded BER/BLER with a selectable in-framework FEC.

    The reference's coded link uses Sionna's 5G LDPC
    (``MimoSimulation/KerasFullSimulation.py:139-151``). Here:

    - ``fec="conv"``: K=7 rate-1/2 convolutional code + soft Viterbi
      (:mod:`.coding`) — any payload size (zero-tail fills the frame).
    - ``fec="ldpc"``: rate-1/2 QC-LDPC (n=648) + normalized min-sum BP
      (:mod:`.ldpc`, the 5G-LDPC algorithm family); the payload
      ``n_streams * num_symbols * bps`` must be a multiple of 648.

    One payload spans all streams/symbols of a channel realization, so BLER
    is per realization. Returns (ber, bler, info_bits_total).
    """
    import numpy as np

    from .coding import K, conv_encode, viterbi_decode
    from .qam import qam_llr

    h_true = _as_complex(h_true)
    h_precode = _as_complex(h_precode)
    b = h_true.shape[0]
    bps = int(np.log2(cfg.qam_order))
    n_coded = cfg.n_streams * num_symbols * bps

    k_bits, k_noise = jax.random.split(key)
    if fec == "ldpc":
        from .ldpc import ldpc_encode, make_qc_ldpc

        code = make_qc_ldpc()
        if n_coded % code.n:
            raise ValueError(
                f"LDPC payload {n_coded} must be a multiple of n={code.n}"
            )
        frames = n_coded // code.n
        n_info = frames * code.k
        info = jax.random.bernoulli(k_bits, 0.5, (b, frames, code.k)).astype(jnp.int32)
        coded = ldpc_encode(code, info).reshape(b, n_coded).astype(jnp.float32)
        info = info.reshape(b, n_info)
    else:
        n_info = n_coded // 2 - (K - 1)  # rate-1/2 + zero tail fills the frame
        info = jax.random.bernoulli(k_bits, 0.5, (b, n_info)).astype(jnp.int32)
        coded = conv_encode(info).astype(jnp.float32)  # [B, n_coded]

    syms = qam_map(coded, cfg.qam_order).reshape(b, cfg.n_streams, num_symbols)
    p = zf_precoder(h_precode)
    x = jnp.einsum("bts,bsn->btn", p, syms)
    y = jnp.einsum("brt,btn->brn", h_true, x)
    # Es/N0 accounts for the code rate: Eb refers to *information* bits.
    esno = 10.0 ** (jnp.asarray(ebno_db) / 10.0) * bps * 0.5
    noise_var = 1.0 / esno
    kr, ki = jax.random.split(k_noise)
    noise = jnp.sqrt(noise_var / 2) * (
        jax.random.normal(kr, y.shape) + 1j * jax.random.normal(ki, y.shape)
    )
    y = y + noise

    h_eff = h_true @ p
    y_t = jnp.swapaxes(y, 1, 2)
    x_hat = jax.vmap(lambda yy, hh: lmmse_equalize(yy, hh, noise_var))(y_t, h_eff)
    x_hat = jnp.swapaxes(x_hat, 1, 2).reshape(b, cfg.n_streams * num_symbols)

    llr = qam_llr(x_hat[..., None], cfg.qam_order, noise_var).reshape(b, n_coded)
    if fec == "ldpc":
        from .ldpc import ldpc_decode

        decoded = ldpc_decode(
            code, llr.reshape(b, frames, code.n), num_iters=25
        ).reshape(b, n_info)
    else:
        decoded = viterbi_decode(llr, num_bits=n_info)
    bit_errs = jnp.sum(decoded != info, axis=-1)
    ber = jnp.sum(bit_errs) / (b * n_info)
    bler = jnp.mean((bit_errs > 0).astype(jnp.float32))
    return ber, bler, b * n_info
