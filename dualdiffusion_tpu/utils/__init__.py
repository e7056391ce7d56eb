from .config import (CONFIG_PATH, MODELS_PATH, DATASET_PATH, DEBUG_PATH,
                     CACHE_PATH, NO_GUI, load_config, save_config,
                     config_from_dict, config_to_dict, load_json, save_json)
from .jax_cache import enable_compilation_cache
from .audio_metadata import (AudioInfo, get_audio_info, get_audio_metadata,
                             update_audio_metadata, is_flac_file)
from .utils import (load_audio, save_audio, get_audio_loudness, normalize_lufs,
                    load_safetensors, save_safetensors, load_safetensors_metadata,
                    tensor_to_img, save_img, quantize_tensor, dequantize_tensor,
                    mu_law_encode, mu_law_decode, cos_angle, slerp, fractal_noise_2d)
