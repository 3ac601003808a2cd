"""graph-gpt-tpu: TPU-native GraphGPT framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of alibaba/graph-gpt
(GraphGPT: Generative Pre-trained Graph Eulerian Transformer, ICML 2025)
for TPU: Eulerian graph serialization, stacked graph-sequence tokenization,
NTP/SMTP pre-training and task fine-tuning on a Llama-style decoder, with a
fully jitted bf16 train step, Pallas flash attention, and pjit sharding over
device meshes.
"""

__version__ = "0.1.0"

from .config import Config, load_config  # noqa: F401
