"""Native FLAC tag editing (utils/audio_metadata.py) — the rating
round-trip the dataset-cleaning loop relies on (reference:
src/utils/dual_diffusion_utils.py:354-419 via mutagen)."""

import json
import struct

import pytest

from dualdiffusion_tpu.utils.audio_metadata import (
    AudioInfo, get_audio_info, get_audio_metadata, is_flac_file,
    update_audio_metadata)
from dualdiffusion_tpu.dataset.processes import BuildSplitsStage


FRAMES = b"\xff\xf8fake-audio-frames" * 64


def make_flac(path, sample_rate=32000, channels=2, bits=16,
              num_samples=65536, tags=None):
    """Minimal structurally-valid FLAC: STREAMINFO [+ VORBIS_COMMENT]
    + PADDING, then opaque frame bytes (tag editing never decodes)."""
    si = bytearray(34)
    struct.pack_into(">HH", si, 0, 4096, 4096)
    packed = (sample_rate << 44) | ((channels - 1) << 41) \
        | ((bits - 1) << 36) | num_samples
    si[10:18] = packed.to_bytes(8, "big")
    blocks = [(0, bytes(si))]
    if tags:
        vc = bytearray()
        vendor = b"test"
        vc += struct.pack("<I", len(vendor)) + vendor
        entries = [f"{k}={v}".encode() for k, v in tags.items()]
        vc += struct.pack("<I", len(entries))
        for e in entries:
            vc += struct.pack("<I", len(e)) + e
        blocks.append((4, bytes(vc)))
    blocks.append((1, b"\x00" * 16))                     # padding
    with open(path, "wb") as fh:
        fh.write(b"fLaC")
        for i, (btype, data) in enumerate(blocks):
            last = 0x80 if i == len(blocks) - 1 else 0
            fh.write(bytes([last | btype]) + len(data).to_bytes(3, "big")
                     + data)
        fh.write(FRAMES)


def test_audio_info(tmp_path):
    p = tmp_path / "a.flac"
    make_flac(p, sample_rate=44100, channels=1, bits=24, num_samples=44100)
    assert is_flac_file(p)
    info = get_audio_info(p)
    assert info == AudioInfo(44100, 1, 24, 44100)
    assert info.duration == 1.0


def test_rating_round_trip_preserves_audio(tmp_path):
    p = tmp_path / "a.flac"
    make_flac(p, tags={"game": "chrono", "clap_score": "0.5"})
    update_audio_metadata(p, metadata={"song": "frog theme"}, rating=4,
                          clear_clap_fields=True)
    tags = get_audio_metadata(p)
    assert tags["RATING"] == ["4"]
    assert tags["RATING WMP"] == ["4"]
    assert tags["FMPS_RATING"] == ["0.8"]
    assert tags["song"] == ["frog theme"]
    assert tags["game"] == ["chrono"]                    # untouched
    assert "clap_score" not in tags                      # cleared
    # audio frames byte-identical after the tag rewrite
    assert open(p, "rb").read().endswith(FRAMES)
    assert get_audio_info(p).sample_rate == 32000


def test_update_overwrites_case_insensitively(tmp_path):
    p = tmp_path / "a.flac"
    make_flac(p, tags={"Rating": "1"})
    update_audio_metadata(p, rating=5, copy_on_write=True)
    tags = get_audio_metadata(p)
    assert tags["RATING"] == ["5"] and "Rating" not in tags
    assert not (tmp_path / "a.flac.tmp").exists()


def test_insert_comment_block_when_absent(tmp_path):
    p = tmp_path / "a.flac"
    make_flac(p)                                         # no VC block
    assert get_audio_metadata(p) == {}
    update_audio_metadata(p, metadata={"prompt": "jazz", "n": 3})
    tags = get_audio_metadata(p)
    assert tags["prompt"] == ["jazz"] and tags["n"] == ["3"]


def test_sidecar_fallback_for_wav(tmp_path):
    p = tmp_path / "a.wav"
    p.write_bytes(b"RIFF....WAVE")
    update_audio_metadata(p, rating=2, metadata={"clap_x": "1"})
    update_audio_metadata(p, clear_clap_fields=True)
    tags = get_audio_metadata(p)
    assert tags["RATING"] == ["2"] and "clap_x" not in tags
    assert json.loads((tmp_path / "a.wav.json").read_text())["RATING"] == "2"


@pytest.mark.parametrize("rating,expect", [
    (None, ["train"]),
    (0, ["train_negative"]),
    (1, ["train_negative"]),
    (2, ["train"]),
    (3, ["train", "train_positive"]),
    (5, ["train", "train_positive"]),
])
def test_rating_split_routing(rating, expect):
    # reference: src/dataset/processes/build_splits.py:79-94
    assert BuildSplitsStage.route_splits("train", rating) == expect


def test_write_jsonl_rating_splits(tmp_path):
    recs = [{"file_name": f"f{i}.wav", "rating": r}
            for i, r in enumerate([None, 0, 3, 3, 2])]
    BuildSplitsStage.write_jsonl(recs, str(tmp_path),
                                 validation_fraction=0.0)
    lines = lambda n: [json.loads(l) for l in
                       (tmp_path / n).read_text().strip().splitlines() if l]
    train = lines("train.jsonl")
    assert {r["file_name"] for r in train} == {"f0.wav", "f2.wav",
                                               "f3.wav", "f4.wav"}
    assert [r["file_name"] for r in lines("train_negative.jsonl")] == ["f1.wav"]
    assert {r["file_name"] for r in lines("train_positive.jsonl")} == \
        {"f2.wav", "f3.wav"}
    assert (tmp_path / "validation.jsonl").read_text() == ""
