"""Concrete dataset-factory processes.

Capability parity with the reference's process zoo
(reference: src/dataset/processes/ — import, normalize, encode, label,
dedupe, build_splits, build_emb_db, integrity_check), adapted to this
environment:

  * audio codecs: WAV natively; FLAC via external binary when present
    (none in this image) — the import stage transcodes/copies accordingly.
  * per-file metadata lives in a ``<file>.json`` sidecar (the reference
    writes mutagen tags into the audio files; sidecars are
    codec-independent and atomic).
  * the encode stage is the accelerator ("tpu") stage: it loads the
    pipeline once per worker, builds time-offset / pitch-shift /
    stereo-mirror augmentations, tile-encodes latent variations and CLAP
    embeddings, and writes copy-on-write safetensors
    (reference: processes/encode.py:65-398).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils import (get_audio_loudness, load_audio, load_safetensors,
                     normalize_lufs, save_audio, save_json, save_safetensors)
from .processor import DatasetProcessStage, DatasetProcessorConfig

logger = logging.getLogger(__name__)

AUDIO_EXTS = (".wav", ".flac")


def sidecar_path(audio_path: str) -> Path:
    return Path(str(audio_path) + ".json")


def read_sidecar(audio_path: str) -> Dict[str, Any]:
    p = sidecar_path(audio_path)
    if p.is_file():
        return json.loads(p.read_text())
    return {}


def write_sidecar(audio_path: str, data: Dict[str, Any],
                  test_mode: bool = False) -> None:
    if test_mode:
        return
    existing = read_sidecar(audio_path)
    existing.update(data)
    save_json(existing, sidecar_path(audio_path))


# ---------------------------------------------------------------------------
# import
# ---------------------------------------------------------------------------

class ImportStage(DatasetProcessStage):
    """Copy/transcode source audio into the dataset tree
    (reference: processes/import.py)."""
    stage_type = "io"

    def __init__(self, output_dir: str, transcode_to: str = "wav") -> None:
        self.output_dir = output_dir
        self.transcode_to = transcode_to

    def start_process(self, config, worker_index):
        self.config = config

    def process(self, item: str):
        src = Path(item)
        if src.suffix.lower() not in AUDIO_EXTS:
            return None
        dst = Path(self.output_dir) / (src.stem + "." + self.transcode_to)
        if dst.exists() and not self.config.force_overwrite:
            return str(dst)
        if self.config.test_mode:
            return str(dst)
        dst.parent.mkdir(parents=True, exist_ok=True)
        if src.suffix.lower() == "." + self.transcode_to:
            shutil.copy2(src, dst)
        else:
            audio, sr = load_audio(src, return_sample_rate=True)
            save_audio(audio, sr, dst)
        return str(dst)


# ---------------------------------------------------------------------------
# normalize
# ---------------------------------------------------------------------------

class NormalizeStage(DatasetProcessStage):
    """LUFS loudness normalization + clipping detection
    (reference: processes/normalize.py:53-271)."""
    stage_type = "cpu"

    def __init__(self, target_lufs: float = -20.0, clip_threshold: float = 0.999) -> None:
        self.target_lufs = target_lufs
        self.clip_threshold = clip_threshold

    def start_process(self, config, worker_index):
        self.config = config

    def process(self, item: str):
        meta = read_sidecar(item)
        if meta.get("post_norm_lufs") is not None and not self.config.force_overwrite:
            return item
        audio, sr = load_audio(item, return_sample_rate=True)
        pre = get_audio_loudness(audio, sr)
        out = normalize_lufs(audio, sr, self.target_lufs)
        clipped = float(np.mean(np.abs(out) >= self.clip_threshold))
        if clipped > 0.001:
            logging.getLogger(__name__).warning(
                "%s: %.2f%% clipped samples after normalization",
                item, clipped * 100)
        if not self.config.test_mode:
            save_audio(out, sr, item)
        write_sidecar(item, {"pre_norm_lufs": pre,
                             "post_norm_lufs": self.target_lufs,
                             "clipped_fraction": clipped},
                      self.config.test_mode)
        return item


# ---------------------------------------------------------------------------
# encode (accelerator stage)
# ---------------------------------------------------------------------------

@dataclass
class EncodeConfig:
    model_path: str = ""
    num_time_offset_augmentations: int = 4
    # pitch offsets (semitones): each builds a frequency-shifted format
    # (reference: processes/encode.py:223-227, 267-270)
    pitch_shift_augmentations: Tuple[int, ...] = ()
    stereo_mirror_augmentation: bool = True
    max_chunk: int = 6144
    overlap: int = 256
    encode_embeddings: bool = True
    latents_dir: str = "latents"


class EncodeLoadStage(DatasetProcessStage):
    """io: probe + load audio and any existing latents safetensors
    (reference: processes/encode.py:65-210)."""
    stage_type = "io"

    def __init__(self, encode_config: EncodeConfig) -> None:
        self.enc = encode_config

    def start_process(self, config, worker_index):
        self.config = config

    def process(self, item: str):
        out_path = _latents_path(self.enc, self.config.dataset_path, item)
        if out_path.exists() and not self.config.force_overwrite:
            return None  # skip-if-done
        audio, sr = load_audio(item, return_sample_rate=True)
        return {"path": item, "audio": audio, "sample_rate": sr}


class EncodeStage(DatasetProcessStage):
    """tpu: pipeline-based latent + embedding encode
    (reference: processes/encode.py:229-365)."""
    stage_type = "tpu"

    def __init__(self, encode_config: EncodeConfig) -> None:
        self.enc = encode_config

    def start_process(self, config, worker_index):
        self.config = config
        import jax
        from ..pipelines import Pipeline
        from ..models.dae import DAE
        self.jax = jax
        self.pipeline = Pipeline.from_pretrained(self.enc.model_path,
                                                 load_checkpoints=True)
        self.dae_h = self.pipeline.modules.get("dae")
        self.fmt = self.pipeline.format

        # pitch-shift augmentation formats: mel filterbanks scaled by
        # 2**(semitones/12) (reference: encode.py:223-227, 267-270)
        import dataclasses as _dc
        encode_fmts = [self.fmt]
        for shift in self.enc.pitch_shift_augmentations:
            rate = 2.0 ** (shift / 12.0)
            fcfg = self.fmt.config
            if hasattr(fcfg, "ms_freq_min"):
                shifted = _dc.replace(
                    fcfg, ms_freq_min=fcfg.ms_freq_min * rate,
                    ms_freq_max_override=fcfg.ms_freq_max * rate)
            elif hasattr(fcfg, "min_frequency"):
                shifted = _dc.replace(
                    fcfg, min_frequency=fcfg.min_frequency * rate,
                    max_frequency=fcfg.max_frequency * rate)
            else:
                raise ValueError(
                    f"format {type(self.fmt).__name__} does not support "
                    "pitch-shift augmentation")
            encode_fmts.append(type(self.fmt)(shifted))

        # one jitted graph per format: audio batch -> mel -> (tiled)
        # latents. Eager per-op dispatch is pathological on a
        # remote-tunneled TPU.
        def make_encode(fmt):
            def encode_batch(audio):
                import jax.numpy as jnp
                mel = fmt.raw_to_mel_spec(audio.astype(jnp.float32))
                if self.dae_h is None:
                    return mel
                ds = self.dae_h.module.downsample_ratio
                mel = mel[:, :, : mel.shape[2] // ds * ds]
                from ..models.dae import tiled_encode
                return tiled_encode(
                    lambda v, x, e: self.dae_h.module.apply(
                        v, x, e, method=DAE.encode),
                    self.dae_h.variables, mel, None,
                    self.dae_h.module.downsample_ratio,
                    self.dae_h.config.latent_channels,
                    max_chunk=self.enc.max_chunk, overlap=self.enc.overlap)
            return jax.jit(encode_batch)

        self._encode_fns = [make_encode(f) for f in encode_fmts]
        self._encode_batch = self._encode_fns[0]
        self.clap = None
        if self.enc.encode_embeddings:
            try:
                from ..models.embeddings import CLAPEmbedding
                clap = CLAPEmbedding()
                clap._load()
                self.clap = clap
            except Exception as e:
                logging.getLogger(__name__).warning(
                    "CLAP unavailable (%s); skipping embedding encode", e)

    def _augmentations(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """Equal-length augmentation stack (V, C, T') — time offsets slice a
        shared window so one jitted graph serves every variation."""
        enc = self.enc
        hop = getattr(self.fmt.config, "ms_hop_length",
                      getattr(self.fmt.config, "hop_length", 256))
        n = max(enc.num_time_offset_augmentations, 1)
        max_off = 8 * hop * (n - 1) // n
        t_out = audio.shape[-1] - max_off
        outs = []
        for i in range(n):
            off = 8 * hop * i // n
            outs.append(audio[..., off: off + t_out])
        if enc.stereo_mirror_augmentation and audio.shape[0] == 2:
            outs += [a[::-1] for a in list(outs)]
        return np.stack(outs)

    def process(self, item: Dict[str, Any]):
        audio, sr = item["audio"], item["sample_rate"]
        augs = self._augmentations(audio, sr)            # (V, C, T')
        # base format + one frequency-shifted format per pitch offset
        lat = np.concatenate([np.asarray(fn(augs), np.float16)
                              for fn in self._encode_fns], axis=0)
        latents = lat                                    # (V*, H, W, C)
        # store reference layout (V, C, H, W) for time-axis slicing
        latents = np.transpose(latents, (0, 3, 1, 2))

        out: Dict[str, np.ndarray] = {"latents": latents}
        if self.clap is not None:
            out["clap_audio_embeddings"] = self.clap.encode_audio(audio, sr)
        return {"path": item["path"], "tensors": out}


class EncodeSaveStage(DatasetProcessStage):
    """io: copy-on-write safetensors save (reference: encode.py:368-398)."""
    stage_type = "io"

    def __init__(self, encode_config: EncodeConfig) -> None:
        self.enc = encode_config

    def start_process(self, config, worker_index):
        self.config = config

    def process(self, item: Dict[str, Any]):
        out_path = _latents_path(self.enc, self.config.dataset_path, item["path"])
        if not self.config.test_mode:
            out_path.parent.mkdir(parents=True, exist_ok=True)
            tensors = dict(item["tensors"])
            if out_path.exists():  # merge-preserve existing keys
                existing = load_safetensors(out_path)
                for k, v in existing.items():
                    tensors.setdefault(k, v)
            save_safetensors(tensors, out_path)
        lat = item["tensors"]["latents"]
        # store dataset-relative paths for portability
        try:
            rel_out = str(out_path.relative_to(self.config.dataset_path))
        except ValueError:
            rel_out = str(out_path)
        write_sidecar(item["path"], {
            "latents_file_name": rel_out,
            "latents_length": int(lat.shape[-1]),
            "latents_num_variations": int(lat.shape[0]),
            "latents_has_audio_embeddings":
                "clap_audio_embeddings" in item["tensors"],
            "latents_has_text_embeddings":
                "clap_text_embeddings" in item["tensors"],
        }, self.config.test_mode)
        return item["path"]


def _latents_path(enc: EncodeConfig, dataset_path: str, audio_path: str) -> Path:
    rel = Path(audio_path).name
    return Path(dataset_path) / enc.latents_dir / (Path(rel).stem + ".safetensors")


# ---------------------------------------------------------------------------
# label / dedupe / splits / emb db / integrity
# ---------------------------------------------------------------------------

class LabelStage(DatasetProcessStage):
    """CLAP text-label cosine scoring (reference: processes/label.py:28-70):
    per-sample cosine scores of the mean audio embedding against configured
    label text embeddings, written into the sidecar for dataset cleaning."""
    stage_type = "cpu"

    def __init__(self, label_embeddings: Dict[str, np.ndarray]) -> None:
        self.labels = {k: np.asarray(v, np.float32) for k, v in label_embeddings.items()}

    def start_process(self, config, worker_index):
        self.config = config

    def process(self, item: str):
        meta = read_sidecar(item)
        lat_file = meta.get("latents_file_name")
        if not lat_file or not Path(lat_file).is_file():
            return None
        tensors = load_safetensors(lat_file)
        if "clap_audio_embeddings" not in tensors:
            return None
        emb = np.asarray(tensors["clap_audio_embeddings"], np.float32).mean(axis=0)
        emb = emb / (np.linalg.norm(emb) + 1e-8)
        scores = {}
        for name, v in self.labels.items():
            vn = v / (np.linalg.norm(v) + 1e-8)
            scores[name] = float(emb @ vn)
        write_sidecar(item, {"label_scores": scores}, self.config.test_mode)
        return item


class DedupeStage(DatasetProcessStage):
    """Duplicate detection vs an embedding database
    (reference: processes/dedupe.py:100-145)."""
    stage_type = "cpu"

    def __init__(self, emb_db_path: str, threshold: float = 0.97) -> None:
        self.emb_db_path = emb_db_path
        self.threshold = threshold

    def start_process(self, config, worker_index):
        self.config = config
        self.db: Dict[str, np.ndarray] = {}
        if Path(self.emb_db_path).is_file():
            self.db = {k: np.asarray(v, np.float32)
                       for k, v in load_safetensors(self.emb_db_path).items()}

    def process(self, item: str):
        meta = read_sidecar(item)
        lat_file = meta.get("latents_file_name")
        if not lat_file or not Path(lat_file).is_file():
            return None
        tensors = load_safetensors(lat_file)
        if "clap_audio_embeddings" not in tensors:
            return None
        emb = np.asarray(tensors["clap_audio_embeddings"], np.float32).mean(axis=0)
        emb = emb / (np.linalg.norm(emb) + 1e-8)
        dups = []
        for name, v in self.db.items():
            if name == item:
                continue
            sim = float(emb @ (v / (np.linalg.norm(v) + 1e-8)))
            if sim >= self.threshold:
                dups.append({"file": name, "similarity": sim})
        if dups:
            logging.getLogger(__name__).warning(
                "%s: %d likely duplicates (best %.3f)", item, len(dups),
                max(d["similarity"] for d in dups))
        write_sidecar(item, {"duplicates": dups}, self.config.test_mode)
        return item


class BuildSplitsStage(DatasetProcessStage):
    """Emit train/validation jsonl records
    (reference: processes/build_splits.py:42-191). Collects in-process;
    write_jsonl() is called by the runner afterwards.

    Per-file curation metadata (rating / system / game / song / prompt)
    is read from the audio file's native tags when the file is FLAC
    (utils/audio_metadata.py), falling back to the JSON sidecar — the
    reference reads the same fields via mutagen
    (build_splits.py:216-231). Ratings route records into extra splits
    exactly as the reference does (build_splits.py:79-94): rating <= 1
    -> only ``<split>_negative``; rating == 2 -> the base split;
    rating >= 3 -> the base split plus ``<split>_positive``.
    """
    stage_type = "io"

    def __init__(self, validation_fraction: float = 0.02, seed: int = 42) -> None:
        self.validation_fraction = validation_fraction
        self.seed = seed
        self.records: List[Dict[str, Any]] = []

    def start_process(self, config, worker_index):
        self.config = config
        self.records = []

    def process(self, item: str):
        from ..utils.audio_metadata import get_audio_metadata
        meta = read_sidecar(item)
        try:
            tags = {k.lower(): v[0] for k, v in
                    get_audio_metadata(item).items() if v}
        except Exception:
            tags = {}
        try:
            audio, sr = load_audio(item, return_sample_rate=True)
            length = audio.shape[-1]
        except Exception:
            return None
        rating: Optional[int] = None
        raw_rating = tags.get("rating", meta.get("rating"))
        if raw_rating is not None:
            try:
                rating = int(raw_rating)
            except (TypeError, ValueError):
                logger.warning("invalid rating %r in %s", raw_rating, item)
        rec = {"file_name": item, "sample_rate": sr, "sample_length": length,
               "rating": rating,
               "system": tags.get("system", meta.get("system")),
               "game": tags.get("game", meta.get("game")),
               "song": tags.get("song", meta.get("song")),
               "prompt": tags.get("prompt", meta.get("prompt")),
               "post_norm_lufs": meta.get("post_norm_lufs"),
               "latents_file_name": meta.get("latents_file_name"),
               "latents_length": meta.get("latents_length"),
               "latents_num_variations": meta.get("latents_num_variations"),
               "latents_has_audio_embeddings": meta.get("latents_has_audio_embeddings", False),
               "latents_has_text_embeddings": meta.get("latents_has_text_embeddings", False)}
        return rec

    @staticmethod
    def route_splits(base_split: str, rating: Optional[int]) -> List[str]:
        """Rating -> split names (reference: build_splits.py:79-94)."""
        if rating is None or rating == 2:
            return [base_split]
        if rating <= 1:
            return [f"{base_split}_negative"]
        return [base_split, f"{base_split}_positive"]

    @staticmethod
    def write_jsonl(records: List[Dict[str, Any]], dataset_path: str,
                    validation_fraction: float = 0.02, seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(records))
        n_val = int(len(records) * validation_fraction)
        val_idx = set(order[:n_val].tolist())
        splits: Dict[str, List[Dict[str, Any]]] = {"train": [],
                                                   "validation": []}
        for i, rec in enumerate(records):
            base = "validation" if i in val_idx else "train"
            for split in BuildSplitsStage.route_splits(base,
                                                       rec.get("rating")):
                splits.setdefault(split, []).append(rec)
        for split, recs in splits.items():
            with open(Path(dataset_path) / f"{split}.jsonl", "w") as fh:
                for rec in recs:
                    fh.write(json.dumps(rec) + "\n")


class BuildEmbDBStage(DatasetProcessStage):
    """Aggregate per-file mean embeddings into a database
    (reference: processes/build_emb_db.py)."""
    stage_type = "io"

    def start_process(self, config, worker_index):
        self.config = config

    def process(self, item: str):
        meta = read_sidecar(item)
        lat_file = meta.get("latents_file_name")
        if not lat_file or not Path(lat_file).is_file():
            return None
        tensors = load_safetensors(lat_file)
        if "clap_audio_embeddings" not in tensors:
            return None
        emb = np.asarray(tensors["clap_audio_embeddings"], np.float32).mean(axis=0)
        return {"file": item, "embedding": emb}

    @staticmethod
    def write_db(entries: List[Dict[str, Any]], db_path: str) -> None:
        save_safetensors({e["file"]: e["embedding"].astype(np.float16)
                          for e in entries}, db_path)


class AggregateEmbeddingsStage(DatasetProcessStage):
    """Aggregate per-label mean audio/text CLAP embeddings plus the
    dataset-wide ``_unconditional_audio`` / ``_unconditional_text`` means
    into ``dataset_embeddings.safetensors`` — the table
    ``Pipeline.get_prompt_embedding`` consumes for prompting and the CFG
    unconditional embedding (reference: src/dataset/dataset_processor.py
    aggregation block ~:800-832, consumed at
    dual_diffusion_pipeline.py:399-420).

    The label is the sidecar ``label`` field, falling back to the audio
    file's parent directory name (the reference's per-game folders)."""
    stage_type = "io"

    def start_process(self, config, worker_index):
        self.config = config

    def process(self, item: str):
        meta = read_sidecar(item)
        lat_file = meta.get("latents_file_name")
        if not lat_file or not Path(lat_file).is_file():
            return None
        tensors = load_safetensors(lat_file)
        out: Dict[str, Any] = {
            "label": meta.get("label") or Path(item).parent.name}
        if "clap_audio_embeddings" in tensors:
            out["audio"] = np.asarray(tensors["clap_audio_embeddings"],
                                      np.float64).mean(axis=0)
        if "clap_text_embeddings" in tensors:
            out["text"] = np.asarray(tensors["clap_text_embeddings"],
                                     np.float64).mean(axis=0)
        return out if len(out) > 1 else None

    @staticmethod
    def write_db(entries: List[Dict[str, Any]], db_path: str) -> None:
        """Mean per label + dataset mean, all normalized to unit norm
        (matching the reference's normalize() of each aggregate)."""
        sums: Dict[str, np.ndarray] = {}
        counts: Dict[str, int] = {}

        def add(key: str, v: np.ndarray) -> None:
            sums[key] = sums.get(key, 0.0) + v
            counts[key] = counts.get(key, 0) + 1

        for e in entries:
            if e.get("audio") is not None:
                add("_unconditional_audio", e["audio"])
                add(f"{e['label']}_audio", e["audio"])
            if e.get("text") is not None:
                add("_unconditional_text", e["text"])
                add(f"{e['label']}_text", e["text"])
        table = {}
        for k, s in sums.items():
            mean = s / counts[k]
            table[k] = (mean / (np.linalg.norm(mean) + 1e-12)).astype(np.float32)
        save_safetensors(table, db_path)


class IntegrityCheckStage(DatasetProcessStage):
    """Verify audio files decode (reference: processes/integrity_check.py)."""
    stage_type = "cpu"

    def start_process(self, config, worker_index):
        self.config = config
        self.bad = 0

    def process(self, item: str):
        try:
            audio, sr = load_audio(item, return_sample_rate=True)
            assert audio.size > 0 and np.isfinite(audio).all()
        except Exception as e:
            logging.getLogger(__name__).error("integrity failure %s: %s", item, e)
            self.bad += 1
            return None
        return item
