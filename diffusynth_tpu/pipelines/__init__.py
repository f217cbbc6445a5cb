"""Task pipelines: text2sound, sound2sound, inpaint, track rendering.

Each pipeline is a thin host-side orchestrator over jitted device programs:
text-embed -> scan(denoise) -> quantize -> decode -> ISTFT run as a handful
of cached XLA launches (per width bucket), in contrast to the reference's
per-step, per-sample host loops (reference: webUI/natural_language_guided_4/*).
"""

from diffusynth_tpu.pipelines.runtime import DiffuSynthRuntime
from diffusynth_tpu.pipelines.text2sound import Text2SoundPipeline
from diffusynth_tpu.pipelines.sound2sound import Sound2SoundPipeline
from diffusynth_tpu.pipelines.inpaint import InpaintPipeline
from diffusynth_tpu.pipelines.track_render import TrackRenderPipeline
