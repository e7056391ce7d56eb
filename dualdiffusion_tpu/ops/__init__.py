from . import fft, windows
from .windows import get_window
from .stft import stft_pair, istft_pair, frame_signal, overlap_add, stft, istft, stft_num_frames
from .mdct import mdct, imdct, mclt, imclt
from .mel import FrequencyScale, hz_to_mel, mel_to_hz, mel_density
from .fgla import griffinlim, spsi_phase
