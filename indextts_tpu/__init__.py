"""indextts_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the IndexTTS-1.5 stack.

Brand-new implementation with the same capabilities as the PyTorch/IPEX reference
(`cunkai/index-tts-ipex`): zh/en text frontend, conformer+perceiver speaker
conditioning, GPT-2-style autoregressive speech-token decoder with a static-shape
KV cache running as a jitted decode loop, BigVGAN2 vocoder with anti-aliased snake
activations (fused Pallas kernel + composed XLA fallback), ECAPA-TDNN speaker
embedding, DVAE mel codebook, and the IndexTTS engine / CLI / web server on top.

Reference parity map lives in SURVEY.md; citations in docstrings point at
/root/reference file:line for the behavior being matched (never the code).
"""

__version__ = "0.1.0"

from indextts_tpu.config import load_config  # noqa: F401
