#!/usr/bin/env sh
# Turnkey COCO14 reproduction: download -> preprocess -> train -> eval.
#
# This container has no egress and no dataset, so the real-data CIDEr
# numbers (reference README.md:43-52: NIC 104.3 / BUTDSpatial 110.5 /
# BUTDDetection 111.4, SCST + beam) cannot be produced here — this script
# is the one-command path for any egress-enabled TPU host to produce
# them.  Every stage is idempotent (skips work whose outputs exist), so
# rerunning after an interruption continues where it left off.
#
#   scripts/reproduce_coco14.sh [stage] [model]
#     stage: all | download | preprocess | pack | train | eval | dry_run
#            (default all)
#     model: NIC | BUTDSpatial | BUTDDetection | AoASpatial | AoADetection
#            (default BUTDDetection — the strongest reported reference row)
#
# dry_run: generates a miniature COCO14-shaped fixture (tiny JPEGs +
# Karpathy dataset_coco.json + bottom-up TSV; tools/make_coco14_fixture.py)
# in a scratch root and drives the REAL preprocess/pack/train/eval stage
# commands against it on CPU, asserting each stage's artifacts — proving
# the plumbing end-to-end without egress so the day a host has COCO14 the
# script runs unmodified.  Scratch root: $SICZ_DRYRUN_ROOT or mktemp -d.
#
# Disk: ~19 GB COCO14 images, ~25 GB bottom-up TSVs (Detection models
# only), ~19 GB packed image shard (pixel models only; see
# docs/BENCHMARKS.md "From-pixels host ingest" for why the shard is
# required on few-core hosts).  Time on one v5e chip (docs/BENCHMARKS.md):
# XE ~3.4 min/epoch feature-based / ~8.7 min/epoch with CNN finetune at
# batch 128, SCST ~36 s/epoch compute -> a full BUTDDetection XE(30)+
# SCST(50) run is a few hours.
set -eu

STAGE="${1:-all}"
MODEL="${2:-BUTDDetection}"
cd "$(dirname "$0")/.."
ROOT="$PWD"
RUN_ROOT="$ROOT"          # dry_run points this at a scratch tree
MAIN_EXTRA=""             # dry_run appends tiny-run overrides (last wins)

case "$MODEL" in
    NIC|BUTDSpatial|AoASpatial) NEEDS_BU=0 ;;
    BUTDDetection|AoADetection) NEEDS_BU=1 ;;
    *) echo "unknown model $MODEL" >&2; exit 2 ;;
esac

setroots() {
    DS="$RUN_ROOT/Datasets/MSCOCO/2014"
    DATA="$RUN_ROOT/Data/MSCOCO/2014"
    mkdir -p "$DS" "$DATA"
}
setroots

fetch() {  # fetch <url> <dest> — resumable, skipped when dest exists
    [ -f "$2" ] && { echo "have $2"; return 0; }
    echo "downloading $1"
    curl -fL --retry 5 -C - -o "$2.part" "$1"
    mv "$2.part" "$2"
}

do_download() {
    # URLs are the ones the reference documents (README.md:56-58,32)
    fetch http://images.cocodataset.org/zips/train2014.zip "$DS/train2014.zip"
    fetch http://images.cocodataset.org/zips/val2014.zip "$DS/val2014.zip"
    fetch http://cs.stanford.edu/people/karpathy/deepimagesent/caption_datasets.zip \
        "$DS/caption_datasets.zip"
    [ -d "$DS/train2014" ] || unzip -q "$DS/train2014.zip" -d "$DS"
    [ -d "$DS/val2014" ] || unzip -q "$DS/val2014.zip" -d "$DS"
    [ -f "$DS/dataset_coco.json" ] || \
        unzip -qo "$DS/caption_datasets.zip" dataset_coco.json -d "$DS"
    if [ "$NEEDS_BU" = 1 ]; then
        fetch https://imagecaption.blob.core.windows.net/imagecaption/trainval_36.zip \
            "$DS/trainval_36.zip"
        [ -d "$DS/trainval_36" ] || unzip -q "$DS/trainval_36.zip" -d "$DS"
    fi
    # official metric jars (METEOR/SPICE/PTB) — optional but recommended
    sh scripts/get_eval_jars.sh || \
        echo "WARNING: jar fetch failed; METEOR runs in lite mode, SPICE skips"
}

do_preprocess() {
    [ -f "$DS/modified_annotations/captions_train.json" ] || \
        python "$ROOT/preprocess/datasets_json_modification.py" --dataset COCO14 \
            --karpathy_json "$DS/dataset_coco.json"
    [ -f "$DATA/caption_vocab.pkl" ] || \
        python "$ROOT/preprocess/build_caption_vocab.py" \
            --train_caption_path "$DS/modified_annotations/captions_train.json" \
            --vocab_path "$DATA/caption_vocab.pkl"
    [ -f "$DATA/COCO14-train.p" ] || \
        python "$ROOT/preprocess/cider_idf_preprocess.py" --dataset COCO14 \
            --train_caption_path "$DS/modified_annotations/captions_train.json" \
            --vocab_path "$DATA/caption_vocab.pkl" --out_dir "$DATA"
    if [ "$NEEDS_BU" = 1 ] && [ ! -d "$DATA/fixed_bu_feat" ]; then
        python "$ROOT/preprocess/generate_bottom_up_features.py" --operation generate \
            --bu_type fixed --tsv "$DS"/trainval_36/*.tsv* --output_dir "$DATA/"
    fi
}

do_pack() {
    # packed shards: the host-throughput path (docs/BENCHMARKS.md) — bu
    # features for Detection models, decoded uint8 pixels for CNN models
    if [ "$NEEDS_BU" = 1 ]; then
        python "$ROOT/preprocess/generate_bottom_up_features.py" --operation pack \
            --bu_type fixed --output_dir "$DATA/" || true
    else
        make -C "$ROOT/native" || echo "native JPEG loader unavailable; PIL fallback"
        [ -f "$DATA/images_224_packed.npy" ] || \
            python "$ROOT/preprocess/pack_images.py" \
                --annotations "$DS/modified_annotations/captions_train.json" \
                             "$DS/modified_annotations/captions_val.json" \
                             "$DS/modified_annotations/captions_test.json" \
                --image_root "$DS" --dataset COCO14 --output_dir "$DATA"
    fi
}

do_train() {
    USE_BU=""
    [ "$NEEDS_BU" = 1 ] && USE_BU="--use_bu fixed"
    # reference defaults: XE 30 epochs batch 128, then SCST 50 epochs
    # (Main.py:160-161,174-175); identical CLI surface here
    (cd "$RUN_ROOT" && python "$ROOT/Main.py" --dataset COCO14 \
        --model_type "$MODEL" $USE_BU \
        --operation train --start_from checkpoint $MAIN_EXTRA)
    (cd "$RUN_ROOT" && python "$ROOT/Main.py" --dataset COCO14 \
        --model_type "$MODEL" $USE_BU \
        --operation scst_train --start_from checkpoint $MAIN_EXTRA)
}

do_eval() {
    USE_BU=""
    [ "$NEEDS_BU" = 1 ] && USE_BU="--use_bu fixed"
    echo "== $MODEL, SCST best checkpoint, test split, beam 3 =="
    (cd "$RUN_ROOT" && python "$ROOT/Main.py" --dataset COCO14 \
        --model_type "$MODEL" $USE_BU \
        --operation eval --eval_split test --eval_beam_size 3 \
        --eval_scst 1 $MAIN_EXTRA)
    cat <<'TABLE'
Reference results to compare against (README.md:43-52, CIDEr x100,
COCO14 Karpathy test):
  NIC            XE greedy 93.4 | XE beam 98.1 | SCST greedy 103.8 | SCST beam 104.3
  BUTDSpatial    XE greedy 97.3 | XE beam 103.0 | SCST greedy 110.2 | SCST beam 110.5
  BUTDDetection  XE greedy 106.1 | XE beam 111.4 | (no reference SCST row)
TABLE
}

assert_file() { [ -f "$1" ] || { echo "DRY RUN FAILED: missing $1" >&2; exit 1; }; }

do_dry_run() {
    RUN_ROOT="${SICZ_DRYRUN_ROOT:-$(mktemp -d /tmp/sicz_dryrun.XXXXXX)}"
    setroots
    echo "== dry run: $MODEL in $RUN_ROOT =="
    export SICZ_JAX_PLATFORM="${SICZ_JAX_PLATFORM:-cpu}"

    # fixture = what do_download would have left behind
    BU_FLAG=""
    [ "$NEEDS_BU" = 1 ] && BU_FLAG="--bu"
    python "$ROOT/tools/make_coco14_fixture.py" --dataset_root "$DS" $BU_FLAG
    # configs: dataset config verbatim (paths resolve against RUN_ROOT cwd,
    # exactly as the real run resolves them against the repo root); model
    # config with tiny dims so the CPU run stays seconds-scale
    mkdir -p "$RUN_ROOT/Configs/Datasets" "$RUN_ROOT/Configs/Models"
    cp "$ROOT/Configs/Datasets/COCO14.data" "$RUN_ROOT/Configs/Datasets/"
    python - "$ROOT/Configs/Models/$MODEL.json" \
        "$RUN_ROOT/Configs/Models/$MODEL.json" <<'PY'
import json, sys
cfg = json.load(open(sys.argv[1]))
for k in ("embed_dim", "hidden_dim", "atten_dim"):
    if k in cfg:
        cfg[k] = 32
json.dump(cfg, open(sys.argv[2], "w"))
PY
    MAIN_EXTRA="--num_epochs 1 --scst_num_epochs 1 --train_batch_size 4 \
--scst_train_batch_size 4 --eval_batch_size 4 --eval_beam_size 2 \
--img_size 64 --cnn_finetune_start 99 --tqdm_visible False"

    do_preprocess
    for split in train val test; do
        assert_file "$DS/modified_annotations/captions_$split.json"
    done
    assert_file "$DATA/caption_vocab.pkl"
    assert_file "$DATA/COCO14-train.p"
    [ "$NEEDS_BU" = 0 ] || assert_file "$DATA/fixed_bu_feat/1.npz"

    do_pack
    [ "$NEEDS_BU" = 0 ] || assert_file "$DATA/fixed_bu_feats_packed.npy"
    [ "$NEEDS_BU" = 1 ] || assert_file "$DATA/images_224_packed.npy"

    do_train
    CP="$RUN_ROOT/CheckPoints/Model_${MODEL}_Dataset_COCO14"
    assert_file "$CP/cp/Captioner_cp.msgpack"
    assert_file "$CP/cp/state_histories.json"
    assert_file "$CP/cp/Captioner_scst_cp.msgpack"
    assert_file "$CP/best/best_scst_score_record.json"

    do_eval
    echo "DRY RUN OK: $RUN_ROOT"
}

case "$STAGE" in
    dry_run) do_dry_run ;;
    all|download) do_download ;;
esac
if [ "$STAGE" = all ] || [ "$STAGE" = preprocess ]; then do_preprocess; fi
if [ "$STAGE" = all ] || [ "$STAGE" = pack ]; then do_pack; fi
if [ "$STAGE" = all ] || [ "$STAGE" = train ]; then do_train; fi
if [ "$STAGE" = all ] || [ "$STAGE" = eval ]; then do_eval; fi
