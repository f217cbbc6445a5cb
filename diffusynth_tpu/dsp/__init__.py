"""Pure-JAX DSP layer: STFT/ISTFT, the STFT+ codec, Griffin-Lim, resampling,
phase-vocoder pitch shifting, and envelope utilities.

TPU-native replacements for the reference's librosa/scipy call sites
(SURVEY.md section 2.2): every function here is jit/vmap-compatible so audio
processing batches on-device instead of looping per-sample on the host
(reference: webUI/.../utils.py:229-245 loops librosa.istft per item on CPU).
"""

from diffusynth_tpu.dsp.stft import (
    hann_window,
    stft,
    istft,
    pad_stft,
    depad_stft,
    num_frames,
)
from diffusynth_tpu.dsp.codec import encode_stft, decode_stft
from diffusynth_tpu.dsp.griffin_lim import (
    amp_to_audio,
    griffin_lim,
    nn_data_to_audio,
)
from diffusynth_tpu.dsp.resample import resample, adjust_audio_length
from diffusynth_tpu.dsp.pitch import (phase_vocoder, time_stretch,
                                      pitch_shift, pitch_shift_batch)
from diffusynth_tpu.dsp.envelope import adsr_envelope, rms_normalize
from diffusynth_tpu.dsp.utils import (
    rescale,
    unrescale,
    create_key,
    merge_dictionaries,
    safe_int,
)
