"""Dataset factory CLI — runs the staged multiprocess pipelines.

Usage parity with the reference's per-process ``__main__`` CLIs
(reference: src/dataset/processes/*.py):

  python dataset_process.py normalize --dataset_path <dir>
  python dataset_process.py encode --dataset_path <dir> --model_path <model>
  python dataset_process.py integrity_check --dataset_path <dir>
  python dataset_process.py build_splits --dataset_path <dir>
  python dataset_process.py build_emb_db --dataset_path <dir>
  python dataset_process.py import --dataset_path <dir> --input <src_dir>
  python dataset_process.py dedupe --dataset_path <dir>
"""

import argparse
import logging
import sys

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("process", choices=["import", "normalize", "encode",
                                        "label", "dedupe", "build_splits",
                                        "build_emb_db",
                                        "aggregate_embeddings",
                                        "integrity_check"])
    ap.add_argument("--copy_to_model_path", default=None,
                    help="for aggregate_embeddings: also copy the table "
                         "into this model dir so the pipeline picks it up")
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--input", default=None, help="input path override")
    ap.add_argument("--model_path", default=None, help="for encode")
    ap.add_argument("--target_lufs", type=float, default=-20.0)
    ap.add_argument("--max_num_proc", type=int, default=None)
    ap.add_argument("--force_overwrite", action="store_true")
    ap.add_argument("--test_mode", action="store_true")
    ap.add_argument("--validation_fraction", type=float, default=0.02)
    args = ap.parse_args()

    from dualdiffusion_tpu.dataset import (DatasetProcessor,
                                           DatasetProcessorConfig)
    from dualdiffusion_tpu.dataset import processes as P

    cfg = DatasetProcessorConfig(dataset_path=args.dataset_path,
                                 max_num_proc=args.max_num_proc,
                                 force_overwrite=args.force_overwrite,
                                 test_mode=args.test_mode)
    proc = DatasetProcessor(cfg)
    scan = [args.input or args.dataset_path]

    if args.process == "import":
        assert args.input, "import requires --input"
        proc.process("Import", [P.ImportStage(args.dataset_path)],
                     input=[args.input], input_extensions=P.AUDIO_EXTS)
    elif args.process == "normalize":
        proc.process("Normalize", [P.NormalizeStage(args.target_lufs)],
                     input=scan, input_extensions=P.AUDIO_EXTS)
    elif args.process == "encode":
        assert args.model_path, "encode requires --model_path"
        enc = P.EncodeConfig(model_path=args.model_path)
        proc.process("Encode", [P.EncodeLoadStage(enc), P.EncodeStage(enc),
                                P.EncodeSaveStage(enc)],
                     input=scan, input_extensions=P.AUDIO_EXTS)
    elif args.process == "dedupe":
        db = f"{args.dataset_path}/dataset_infos/audio_emb_db.safetensors"
        proc.process("Dedupe", [P.DedupeStage(db)],
                     input=scan, input_extensions=P.AUDIO_EXTS)
    elif args.process == "label":
        from dualdiffusion_tpu.models.embeddings import CLAPEmbedding
        from dualdiffusion_tpu.utils import load_json
        labels_cfg = load_json(f"{args.dataset_path}/dataset_infos/labels.json")
        clap = CLAPEmbedding()
        embs = dict(zip(labels_cfg["labels"],
                        clap.encode_text(labels_cfg["labels"])))
        proc.process("Label", [P.LabelStage(embs)],
                     input=scan, input_extensions=P.AUDIO_EXTS)
    elif args.process == "build_splits":
        out = proc.process("BuildSplits", [P.BuildSplitsStage()],
                           input=scan, input_extensions=P.AUDIO_EXTS,
                           collect_results=True)
        P.BuildSplitsStage.write_jsonl(out["results"], args.dataset_path,
                                       args.validation_fraction)
        print(f"wrote {len(out['results'])} records to train/validation.jsonl")
    elif args.process == "build_emb_db":
        out = proc.process("BuildEmbDB", [P.BuildEmbDBStage()],
                           input=scan, input_extensions=P.AUDIO_EXTS,
                           collect_results=True)
        import os
        os.makedirs(f"{args.dataset_path}/dataset_infos", exist_ok=True)
        P.BuildEmbDBStage.write_db(
            out["results"],
            f"{args.dataset_path}/dataset_infos/audio_emb_db.safetensors")
        print(f"wrote {len(out['results'])} embeddings to audio_emb_db")
    elif args.process == "aggregate_embeddings":
        out = proc.process("AggregateEmbeddings",
                           [P.AggregateEmbeddingsStage()],
                           input=scan, input_extensions=P.AUDIO_EXTS,
                           collect_results=True)
        import os
        import shutil
        os.makedirs(f"{args.dataset_path}/dataset_infos", exist_ok=True)
        db = f"{args.dataset_path}/dataset_infos/dataset_embeddings.safetensors"
        P.AggregateEmbeddingsStage.write_db(out["results"], db)
        print(f"aggregated {len(out['results'])} samples into {db}")
        if args.copy_to_model_path:
            dst = f"{args.copy_to_model_path}/dataset_embeddings.safetensors"
            shutil.copy2(db, dst)
            print(f"copied to {dst}")
    elif args.process == "integrity_check":
        out = proc.process("IntegrityCheck", [P.IntegrityCheckStage()],
                           input=scan, input_extensions=P.AUDIO_EXTS)
        sys.exit(1 if out["errors"] else 0)


if __name__ == "__main__":
    main()
