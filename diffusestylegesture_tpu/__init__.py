"""DiffuseStyleGesture-TPU: TPU-native diffusion co-speech gesture generation.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference (YoungSeng/DiffuseStyleGesture): ZEGGS 6-style gesture
diffusion, BEAT/TWH DiffuseStyleGesture+/++ (audio + text + speaker-ID
conditioning), WavLM-Large audio encoding, windowed long-form sampling, and
the full data/train/sample/export pipeline.
"""

__version__ = "0.1.0"
