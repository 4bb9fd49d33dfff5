"""clip_event_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CLIP-Event framework.

A ground-up rebuild of the capabilities of limanling/clip-event (CVPR 2022
"CLIP-Event: Connecting Text and Images with Event Structures"):

  * CLIP dual encoder (ViT / ModifiedResNet vision tower + causal text
    transformer) with OpenAI-checkpoint compatibility,
  * contrastive fine-tuning with IE-generated hard-negative event
    descriptions (CE / BCE / KL, over-batch or per-instance),
  * optimal-transport (IPOT) graph-alignment loss between text entities
    and detected image objects, implemented as a fused Pallas TPU kernel,
  * event/argument local attention over ViT grid tokens,
  * zero-shot evaluation on M2E2, GSR/SWiG, VCR, VisualCOMET, and
    image-text retrieval (COCO / Flickr30k),
  * a host-overlapped, statically-shaped input pipeline, and
  * pjit/shard_map data-parallel training with sharded in-batch InfoNCE
    over ICI, plus Megatron tensor parallelism, GPipe pipeline
    parallelism, ZeRO-1/ZeRO-3 state sharding, and gradient accumulation.

The compute path is pure JAX (jit/pjit + Pallas kernels); parameters are
plain pytrees so checkpoints round-trip through orbax and the OpenAI
`state_dict` converter.
"""

__version__ = "0.1.0"
