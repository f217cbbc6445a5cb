"""Quality metrics: timbre-encoder Inception Score and spectrogram parity."""

from diffusynth_tpu.metrics.inception_score import inception_score, get_inception_score
from diffusynth_tpu.metrics.parity import spectrogram_mae
