"""vits_tpu — a TPU-native (JAX/XLA/Pallas/pjit) VITS/PITS/Avocodo TTS framework.

A from-scratch re-design of the capabilities of Aloento/VITS ("VariTTS"):
conditional-VAE + flow + GAN text-to-speech with PITS pitch controllability
(Yingram), Avocodo multi-band GAN training, and a trilingual (ZH/JA/EN) IPA
text frontend — built TPU-first:

  * channels-last [B, T, C] layouts so 1-D convs lower to MXU-friendly matmuls
  * static shapes + masks everywhere (bucketed padding, no dynamic control flow)
  * monotonic alignment search as an on-device kernel (no host round-trip)
  * SPMD data parallelism via jax.sharding.Mesh + jit, collectives on ICI
  * explicit PRNG threading for every stochastic site

Reference behavior citations in docstrings point into /root/reference
(file:line) for parity checking only; no code is carried over.
"""

__version__ = "0.1.0"
