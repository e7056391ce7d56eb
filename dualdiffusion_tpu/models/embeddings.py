"""Conditioning embeddings: CLAP audio/text encoder + analysis helpers.

Capability parity with the reference's embedding layer
(reference: src/modules/embeddings/embedding.py:40-93 — abstract
encode_audio/encode_text + PCA / cosine-similarity / dedup helpers — and
src/modules/embeddings/clap.py:54-122 — TWO CLAP models whose normalized
512-d embeddings are concatenated to 1024-d, audio chunked into 10 s 48 kHz
windows).

Environment note: CLAP checkpoints cannot be downloaded in a zero-egress
environment, so the encoder is gated on locally available weights
(``CLAP_MODEL_PATH``); training and sampling treat embeddings as
precomputed dataset artifacts (SURVEY.md §7.4 mitigation), which matches
the reference's own training path (load_datatypes=["latents",
"audio_embeddings"]).

COMPATIBILITY STATEMENT (embedding-space fidelity vs the reference):

* Model 1 is identical: HF ``laion/larger_clap_music`` via
  ``transformers.ClapModel`` (reference clap.py:72-75). Its 512-d half of
  every embedding matches the reference bit-for-bit given the same
  checkpoint revision.
* Model 2 is a documented SUBSTITUTION: the reference loads a
  ``laion_clap`` HTSAT-base checkpoint through the ``laion_clap`` package
  (clap.py:77-81), which is not installable here; this framework uses the
  HF ``laion/clap-htsat-unfused`` release of the same architecture
  instead. The two checkpoints do NOT share weights, so the second 512-d
  half lives in a different embedding space.
* Consequences: a reference-produced ``dataset_embeddings.safetensors``
  REMAINS USABLE as-is — training/sampling only consume stored vectors
  (Pipeline.get_prompt_embedding, dataloader window interpolation) and
  never re-encode. What must not be mixed is ENCODERS within one dataset:
  appending samples encoded here to a reference-encoded dataset (or
  label-scoring across the two) compares vectors from different spaces in
  the 512..1024 half.
* Migration/converter story: there is no linear map between CLAP
  checkpoint spaces; the supported conversion is re-encoding the dataset
  embedding artifacts with one chosen encoder (``python dataset_process.py
  --stages encode,emb-db``). ``scripts/capture_clap_golden.py`` captures
  goldens wherever weights exist; ``tests/test_models_extra.py`` verifies
  the surrounding math (chunking/downmix/normalize/concat) against the
  reference's own code with injected deterministic models, and checks the
  committed golden when present.
* Minor numeric difference: audio resampling to 48 kHz uses linear
  interpolation here vs torchaudio's windowed-sinc kernel
  (clap.py:96-97); goldens are captured at native 48 kHz to exclude it.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class CLAPConfig:
    # Dual-model default mirrors the reference's 1024-d concatenated space
    # (clap.py:69-81): model 1 identical, model 2 the documented
    # clap-htsat-unfused substitution for the laion_clap HTSAT-base
    # checkpoint (see the module docstring's compatibility statement).
    # The 1024-d output matches the models' in_channels_emb default.
    model_paths: Tuple[str, ...] = ("laion/larger_clap_music",
                                    "laion/clap-htsat-unfused")
    sample_rate: int = 48000
    audio_embedding_duration: float = 10.0   # seconds per chunk
    embedding_dim: int = 512                 # per model


# ---------------------------------------------------------------------------
# analysis helpers (reference: embedding.py:40-93)
# ---------------------------------------------------------------------------

def top_pca_components(embeddings: np.ndarray, k: int = 8) -> np.ndarray:
    """(N, D) -> (k, D) principal directions."""
    x = embeddings - embeddings.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return vt[:k]


def cosine_similarity_matrix(a: np.ndarray, b: Optional[np.ndarray] = None) -> np.ndarray:
    b = a if b is None else b
    an = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    bn = b / (np.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    return an @ bn.T


def dedupe_embeddings(embeddings: np.ndarray, threshold: float = 0.99,
                      window: int = 1) -> np.ndarray:
    """Indices of non-duplicate rows; ``window`` > 1 smooths each row with a
    1D moving average over neighbors first (the reference's 1d-conv dedup
    helper)."""
    e = embeddings
    if window > 1:
        kernel = np.ones(window) / window
        e = np.stack([np.convolve(row, kernel, mode="same") for row in e.T]).T
    sim = cosine_similarity_matrix(e)
    keep: List[int] = []
    for i in range(len(e)):
        if all(sim[i, j] < threshold for j in keep):
            keep.append(i)
    return np.asarray(keep, np.int64)


def mp_normalize(x: np.ndarray, eps: float = 1e-4) -> np.ndarray:
    """The reference's magnitude-preserving normalize over the last dim
    (mp_tools.py:42-49): unit RMS per element, i.e. L2 norm == sqrt(D) —
    NOT unit L2. Embeddings stored by the reference (dataset_embeddings,
    per-sample CLAP chunks) carry this scale; matching it keeps this
    framework's encoder output mixable with reference artifacts."""
    norm = np.linalg.norm(x, axis=-1, keepdims=True)
    return (x / (eps + norm / np.sqrt(x.shape[-1]))).astype(x.dtype)


# ---------------------------------------------------------------------------
# CLAP encoder (gated)
# ---------------------------------------------------------------------------

class CLAPEmbedding:
    """Dual-CLAP encoder producing concatenated normalized embeddings."""

    def __init__(self, config: Optional[CLAPConfig] = None) -> None:
        self.config = config or CLAPConfig()
        self._models = None

    @property
    def output_dim(self) -> int:
        return self.config.embedding_dim * len(self.config.model_paths)

    def _load(self):
        if self._models is not None:
            return
        local_root = os.environ.get("CLAP_MODEL_PATH")
        self._models = []
        try:
            from transformers import ClapModel, ClapProcessor
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                "transformers is required for CLAP encoding") from e
        for path in self.config.model_paths:
            load_path = os.path.join(local_root, os.path.basename(path)) \
                if local_root else path
            # fail fast offline: only hit the network when explicitly allowed
            local_only = os.environ.get("CLAP_ALLOW_DOWNLOAD", "0") != "1"
            try:
                model = ClapModel.from_pretrained(load_path,
                                                  local_files_only=local_only)
                proc = ClapProcessor.from_pretrained(load_path,
                                                     local_files_only=local_only)
            except Exception as e:
                raise RuntimeError(
                    f"CLAP weights unavailable at '{load_path}'. In an "
                    "offline environment set CLAP_MODEL_PATH to a directory "
                    "with the checkpoints, or rely on precomputed dataset "
                    "embeddings (the default training path).") from e
            model.eval()
            self._models.append((model, proc))

    def _chunk_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """Mono-mix, resample to 48 kHz, split into duration-sized chunks
        (reference: clap.py:83-110)."""
        if audio.ndim == 2:
            audio = audio.mean(axis=0)
        if sample_rate != self.config.sample_rate:
            # polyphase-free linear resample is adequate for CLAP features
            n_out = int(round(len(audio) * self.config.sample_rate / sample_rate))
            audio = np.interp(np.linspace(0, len(audio) - 1, n_out),
                              np.arange(len(audio)), audio)
        chunk = int(self.config.audio_embedding_duration * self.config.sample_rate)
        if len(audio) < chunk:
            raise ValueError(f"cannot encode audio embedding, audio too "
                             f"short (len: {len(audio)} < chunk {chunk})")
        # truncate the partial tail chunk — reference behavior
        # (clap.py:100-104: audio[:len // chunk * chunk].reshape(-1, chunk))
        n_chunks = len(audio) // chunk
        return audio[:n_chunks * chunk].reshape(n_chunks, chunk).astype(np.float32)

    def encode_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """(C, T) or (T,) audio -> (num_chunks, output_dim) embeddings."""
        self._load()
        import torch
        chunks = self._chunk_audio(audio, sample_rate)
        outs = []
        for model, proc in self._models:
            with torch.no_grad():
                inputs = proc(audios=list(chunks),
                              sampling_rate=self.config.sample_rate,
                              return_tensors="pt")
                feats = model.get_audio_features(**inputs).numpy()
            # reference scale: mp normalize (clap.py:107-108 wraps both
            # models' features with mp_tools.normalize)
            outs.append(mp_normalize(feats))
        return np.concatenate(outs, axis=-1)

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        """list[str] -> (N, output_dim) embeddings."""
        self._load()
        import torch
        outs = []
        for model, proc in self._models:
            with torch.no_grad():
                inputs = proc(text=list(texts), return_tensors="pt", padding=True)
                feats = model.get_text_features(**inputs).numpy()
            outs.append(mp_normalize(feats))  # reference scale (clap.py:119-120)
        return np.concatenate(outs, axis=-1)
