"""Production serving: HTTP API with dynamic micro-batching.

The reference's only serving surface is a Gradio app handling one request
at a time (reference: app.py:91). This layer is new design for production
deployment: a dependency-free HTTP server whose text2sound requests are
coalesced by a micro-batcher into single batched device launches (the
throughput mode the TPU pipeline is built for).
"""

from diffusynth_tpu.serving.batcher import MicroBatcher
from diffusynth_tpu.serving.server import DiffuSynthServer, make_server
