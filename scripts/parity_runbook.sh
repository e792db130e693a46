#!/usr/bin/env bash
# Real-weights parity runbook: ONE command from downloaded checkpoints to
# the full zero-shot metric tables, with every failure diagnosed as early
# as possible (reference anchors: script/depth/eval/{11,12}_*.sh chains +
# README.md checkpoint instructions).
#
# Stages (each skippable, each resumable):
#   1. download  — HF checkpoints into $BASE_CKPT_DIR (needs egress)
#   2. validate  — safetensors-header manifest check (milliseconds;
#                  catches broken/mislabeled checkpoints BEFORE the
#                  multi-GB device upload) [cli.validate_ckpt]
#   3. smoke     — from_pretrained + one tiny inference per modality on
#                  the real chip (catches load-path issues in ~1 min)
#   4. eval      — the full --parity protocol suites (depth 5 datasets,
#                  normals 5, iid 2); requires $BASE_DATA_DIR with the
#                  eval datasets (reference script/download_data*.sh)
#
# Usage:
#   BASE_CKPT_DIR=checkpoint BASE_DATA_DIR=data \
#       scripts/parity_runbook.sh [--skip-download] [--skip-eval] \
#                                 [--modality depth|normals|iid|all]
#
# Expected paper metrics the eval outputs should reproduce (BASELINE.md,
# arXiv:2312.02145; AbsRel% down / delta1% up):
#   NYUv2 5.5/96.4  KITTI 9.9/91.6  ETH3D 6.5/96.0
#   ScanNet 6.4/95.1  DIODE 30.8/77.3
set -e
cd "$(dirname "$0")/.."

ckpt_dir=${BASE_CKPT_DIR:-"checkpoint"}
out=${OUTPUT_DIR:-"output/parity"}
modality="all"
do_download=1 do_eval=1
for arg in "$@"; do
    case "$arg" in
        --skip-download) do_download=0 ;;
        --skip-eval) do_eval=0 ;;
        --modality) ;;  # consumed by the next case via lookahead below
        depth|normals|iid|all) modality="$arg" ;;
        *) echo "unknown arg: $arg" >&2; exit 2 ;;
    esac
done

declare -A CKPTS=(
    [depth]="marigold-depth-v1-1"
    [normals]="marigold-normals-v1-1"
    [iid_appearance]="marigold-iid-appearance-v1-1"
    [iid_lighting]="marigold-iid-lighting-v1-1"
)
mods() {  # checkpoint keys for the selected modality
    case "$modality" in
        depth) echo depth ;;
        normals) echo normals ;;
        iid) echo iid_appearance iid_lighting ;;
        all) echo depth normals iid_appearance iid_lighting ;;
    esac
}

echo "== stage 1: download (checkpoints -> $ckpt_dir)"
if [ "$do_download" = 1 ]; then
    BASE_CKPT_DIR="$ckpt_dir" bash scripts/download_weights.sh
else
    echo "skipped (--skip-download)"
fi

echo "== stage 2: validate (safetensors-header manifest check)"
dirs=()
for m in $(mods); do
    d="$ckpt_dir/${CKPTS[$m]}"
    [ -d "$d" ] || { echo "MISSING checkpoint dir: $d" >&2; exit 1; }
    dirs+=("$d")
done
python -m marigold_tpu.cli.validate_ckpt "${dirs[@]}"

echo "== stage 3: smoke (from_pretrained + tiny inference per modality)"
python - "$ckpt_dir" "$modality" <<'PY'
import sys, time
import numpy as np
ckpt_dir, modality = sys.argv[1], sys.argv[2]
import marigold_tpu  # noqa: F401 (installs platform/env handling)
from marigold_tpu.pipelines.depth import MarigoldDepthPipeline
from marigold_tpu.pipelines.normals import MarigoldNormalsPipeline
from marigold_tpu.pipelines.iid import MarigoldIIDPipeline

jobs = {
    "depth": (MarigoldDepthPipeline, "marigold-depth-v1-1"),
    "normals": (MarigoldNormalsPipeline, "marigold-normals-v1-1"),
    "iid": (MarigoldIIDPipeline, "marigold-iid-appearance-v1-1"),
}
keys = list(jobs) if modality == "all" else [modality]
rng = np.random.default_rng(0)
img = rng.integers(0, 255, (384, 512, 3), dtype=np.uint8)
for k in keys:
    cls, name = jobs[k]
    t0 = time.time()
    pipe = cls.from_pretrained(f"{ckpt_dir}/{name}")
    t1 = time.time()
    kw = {"color_map": None} if k == "depth" else {}
    out = pipe(img, denoising_steps=1, ensemble_size=1,
               processing_res=384, show_progress_bar=False, **kw)
    t2 = time.time()
    arr = getattr(out, "depth_np", None)
    if arr is None:
        arr = getattr(out, "normals_np", None)
    if arr is None:  # IID: container keyed by target name
        arr = out.entries[0].array
    assert np.isfinite(np.asarray(arr)).all(), f"{k}: non-finite output"
    print(f"smoke {k}: load {t1-t0:.1f}s, infer {t2-t1:.1f}s, "
          f"output {np.asarray(arr).shape} OK")
PY

echo "== stage 4: eval (--parity protocol suites)"
if [ "$do_eval" = 1 ]; then
    case "$modality" in
        depth) bash scripts/eval/depth_all.sh "$ckpt_dir/marigold-depth-v1-1" "$out" ;;
        normals) bash scripts/eval/normals_all.sh "$ckpt_dir/marigold-normals-v1-1" "$out" ;;
        iid) bash scripts/eval/iid_all.sh "$ckpt_dir/marigold-iid-appearance-v1-1" \
                 "$ckpt_dir/marigold-iid-lighting-v1-1" "$out" ;;
        all)
            bash scripts/eval/depth_all.sh "$ckpt_dir/marigold-depth-v1-1" "$out"
            bash scripts/eval/normals_all.sh "$ckpt_dir/marigold-normals-v1-1" "$out"
            bash scripts/eval/iid_all.sh "$ckpt_dir/marigold-iid-appearance-v1-1" \
                "$ckpt_dir/marigold-iid-lighting-v1-1" "$out"
            ;;
    esac
    echo "Compare $out/*/eval_metrics* against the expected table above."
else
    echo "skipped (--skip-eval)"
fi
echo "== runbook complete"
