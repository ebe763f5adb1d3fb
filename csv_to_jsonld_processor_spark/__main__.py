"""CLI mirroring the reference's three entry points (main.rs:114-295):

  python -m csv_to_jsonld_processor_spark process  --manifest M [--base-path P] [--output O] [--strict]
  python -m csv_to_jsonld_processor_spark validate --manifest M
  python -m csv_to_jsonld_processor_spark generate-manifest [--output O]
"""

from __future__ import annotations

import argparse
import json
import sys

TEMPLATE = {
    "@context": {
        "@vocab": "https://ns.flur.ee/imports#",
        "sequence": {"@id": "https://ns.flur.ee/imports#sequence", "@container": "@list"},
    },
    "@type": "CSVImportManifest",
    "@id": "model/my-dataset",
    "name": "My dataset import",
    "description": "Describe the import here",
    "model": {
        "baseIRI": "http://example.com/terms/",
        "path": "model/",
        "sequence": [
            {"path": "DataModel.csv", "@type": ["CSVImportStep", "BasicVocabularyStep"]}
        ],
    },
    "instances": {
        "baseIRI": "http://example.com/ids/",
        "path": "instances/",
        "sequence": [
            {
                "path": "Things.csv",
                "@type": ["CSVImportStep", "BasicInstanceStep"],
                "instanceType": "Thing",
            }
        ],
    },
}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="csv_to_jsonld_processor_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("process")
    p.add_argument("--manifest", required=True)
    p.add_argument("--base-path", default=None)
    p.add_argument("--output", default="./output")
    p.add_argument("--strict", action="store_true")
    p.add_argument("--vocab-meta", default=None,
                   help="path to an exported vocab_meta.json; skips the model phase (S5)")
    p.add_argument("--sniff-model-files", action="store_true",
                   help="apply the reference's is_model_file header sniff to CSV model "
                        "steps (P7 parity; skips files lacking the five sniff headers)")
    p.add_argument("--cpus", type=int, default=None)

    v = sub.add_parser("validate")
    v.add_argument("--manifest", required=True)

    g = sub.add_parser("generate-manifest")
    g.add_argument("--output", default="manifest.jsonc")

    args = ap.parse_args(argv)

    if args.cmd == "generate-manifest":
        with open(args.output, "w") as f:
            json.dump(TEMPLATE, f, indent=2)
        print(f"wrote manifest template to {args.output}")
        return 0

    from .manifest import Manifest

    if args.cmd == "validate":
        try:
            m = Manifest.from_file(args.manifest)
        except Exception as e:  # noqa: BLE001
            print(f"manifest failed to parse: {e}", file=sys.stderr)
            return 1
        errors = m.validate()
        for e in errors:
            print(f"error: {e}", file=sys.stderr)
        print("manifest valid" if not errors else f"{len(errors)} error(s)")
        return 1 if errors else 0

    # process
    from .plans.pipeline import Pipeline
    from .session import get_spark

    pipeline = Pipeline.from_manifest(
        args.manifest, args.base_path, strict=args.strict, vocab_meta=args.vocab_meta,
        sniff_model_files=args.sniff_model_files,
    )
    spark = get_spark("csv-to-jsonld-process", cpus=args.cpus)
    outcome = pipeline.run(spark, args.output)
    if outcome.errors:
        for e in outcome.errors:
            print(f"error: {e}", file=sys.stderr)
        return 1
    print(json.dumps({"status": "ok", **outcome.counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
