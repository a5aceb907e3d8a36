"""channelestimationtransformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
transformer-based channel prediction in beamformed massive-MIMO links.

Brand-new design with the capabilities of the reference repo
Bart-Hodes/ChannelEstimationTransformer (PyTorch/CUDA), re-architected TPU-first:

- ``channel/``  — in-framework CDL-style channel simulator + DFT-codebook beam sweep
                  (replaces the reference's Sionna + MATLAB chain,
                  reference ``GenerateDatasets/``).
- ``data/``     — device-resident dataset windowing, AWGN, complex<->real packing
                  (reference ``Utils/dataset.py``).
- ``models/``   — Informer (full + ProbSparse attention, conv distilling),
                  vanilla Transformer, RNN/GRU/LSTM via ``lax.scan``
                  (reference ``models/``).
- ``ops/``      — quantization number formats, fake-quant ops with STE custom_vjp,
                  LSQ / LSQ-fibbinary layers, Pallas fused kernels
                  (reference ``qtorch`` fork + ``fibbinary_cpu`` CUDA extension).
- ``parallel/`` — mesh construction and sharding rules (the reference has no
                  distributed support; this is designed-in here).
- ``train/``    — jitted train/eval steps, cosine LR, checkpointing, sweep runner
                  (reference ``FullPrecision/`` + ``QuantizationStudy/`` drivers).
- ``sim/``      — MIMO-OFDM end-to-end link simulation, BER/spectral efficiency
                  (reference ``MimoSimulation/``, ``SpectralEfficiency(WIP)/``).
- ``utils/``    — logging in the reference's parseable format, profiling helpers.
"""

__version__ = "0.1.0"
