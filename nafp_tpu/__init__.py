"""nafp_tpu — a TPU-native neural audio fingerprinting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mimbres/neural-audio-fp ("Neural Audio Fingerprint for High-specific Audio
Retrieval based on Contrastive Learning", ICASSP 2021, arXiv:2010.11910).

Not a port: the compute path is pure functional JAX (melspec as DFT matmuls,
a Flax encoder, cross-replica NT-Xent over an ICI mesh), augmentation runs
on-device keyed by PRNG, and retrieval is built on MXU matmuls + `lax.top_k`
instead of FAISS.

Package layout
--------------
- ``ops``      — DSP frontend (log-mel), spectral & time-domain augmentation
- ``models``   — the FingerPrinter encoder (Flax)
- ``losses``   — NT-Xent (cross-replica) and online triplet losses
- ``optim``    — LAMB optimizer + LR schedules
- ``parallel`` — device mesh / sharding helpers
- ``data``     — audio IO, segment catalogs, host batch loader
- ``train``    — train/val steps, epoch loop, checkpointing, mini-search
- ``search``   — exact & IVF/PQ retrieval, sequence re-ranking, evaluation
"""

__version__ = "0.1.0"
