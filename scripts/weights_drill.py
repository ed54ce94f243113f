"""Weights-arrival readiness drill (VERDICT r3 #9): ONE command that takes a
checkpoint from "URL or dir" to "validated + parity-checked + eval queued".

The day egress opens:

    python scripts/weights_drill.py jedyang97/Fast3R_ViT_Large_512 \
        --images /path/to/demo_examples/teddybear \
        --re10k-video-root R --re10k-txt-root T

does, in order: (a) resolve the checkpoint — local dir as-is, else
huggingface_hub snapshot download; (b) scripts/validate_published.py
configs 1-2 (2-view torch cross-implementation parity + per-stage
checksums, 8-view PnP backend agreement); (c) RE10K pose eval (config 3)
when data roots are given; (d) writes docs/weights_drill_report.json.

Until then, --dry-run proves the chain end-to-end with NO network: a
random-weight flagship (or --tiny) model is exported through the same
HF-format writer the reference publishes with
(utils/checkpoint_utils.convert_checkpoint_to_hf, reference
checkpoint_utils.py:107-139), then fed through the identical (a)-(d) path.
tests/test_weights_drill.py runs the tiny dry-run in CI.
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))


def resolve_checkpoint(name_or_dir: str, dry_run: bool, tiny: bool,
                       work_dir: str) -> str:
    if dry_run:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from fast3r_tpu.inference import Fast3R
        from fast3r_tpu.models.fast3r import Fast3RConfig
        from fast3r_tpu.utils.checkpoint_utils import convert_checkpoint_to_hf

        cfg = Fast3RConfig.tiny() if tiny else Fast3RConfig.flagship(
            attn_impl="xla")
        out = osp.join(work_dir, "dryrun_hf_export")
        print(f"[drill] dry-run: exporting random "
              f"{'tiny' if tiny else 'flagship'} weights to HF layout at "
              f"{out}", flush=True)
        convert_checkpoint_to_hf(Fast3R.from_random(cfg), out)
        return out
    if osp.isdir(name_or_dir):
        return name_or_dir
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise SystemExit(
            f"{name_or_dir} is not a local dir and huggingface_hub is "
            f"unavailable ({e}); pass a local checkpoint dir or --dry-run"
        ) from e
    print(f"[drill] downloading {name_or_dir} from the hub", flush=True)
    return snapshot_download(repo_id=name_or_dir)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint", nargs="?",
                    default="jedyang97/Fast3R_ViT_Large_512")
    ap.add_argument("--dry-run", action="store_true",
                    help="no network: drill against a local random-weight "
                         "HF export")
    ap.add_argument("--tiny", action="store_true",
                    help="dry-run at tiny dims (CI)")
    ap.add_argument("--images", default=None)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--re10k-video-root", default=None)
    ap.add_argument("--re10k-txt-root", default=None)
    ap.add_argument("--re10k-max-scenes", type=int, default=None)
    ap.add_argument("--out", default=osp.join(REPO, "docs",
                                              "weights_drill_report.json"))
    args = ap.parse_args(argv)

    import validate_published

    t0 = time.time()
    report = {"drill_args": vars(args).copy()}
    with tempfile.TemporaryDirectory(prefix="f3r_drill_") as td:
        ckpt = resolve_checkpoint(args.checkpoint, args.dry_run, args.tiny,
                                  td)
        report["resolved_checkpoint"] = ckpt

        val_out = osp.join(td, "published_validation.json")
        argv2 = [ckpt, "--out", val_out, "--size", str(args.size)]
        if args.images:
            argv2 += ["--images", args.images]
        if args.dry_run:
            # random weights: PnP agreement between backends is still
            # checked but not gated (no geometry in the predictions)
            argv2 += ["--pose-agreement-min", "-1"]
        if args.re10k_video_root and args.re10k_txt_root:
            argv2 += ["--re10k-video-root", args.re10k_video_root,
                      "--re10k-txt-root", args.re10k_txt_root]
            if args.re10k_max_scenes:
                argv2 += ["--re10k-max-scenes", str(args.re10k_max_scenes)]
        print(f"[drill] validate_published {' '.join(argv2)}", flush=True)
        rc = validate_published.main(argv2)
        with open(val_out) as f:
            report["validation"] = json.load(f)
        report["validation_rc"] = rc

    report["elapsed_s"] = round(time.time() - t0, 1)
    report["overall"] = report["validation"].get("overall", "fail")
    os.makedirs(osp.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(f"[drill] {report['overall'].upper()} in {report['elapsed_s']} s "
          f"-> {args.out}", flush=True)
    return 0 if report["overall"] == "pass" else 1


if __name__ == "__main__":
    raise SystemExit(main())
