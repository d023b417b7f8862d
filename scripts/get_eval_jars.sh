#!/usr/bin/env sh
# Fetch the three Java tools the official COCO evaluation protocol shells
# out to — Stanford CoreNLP PTBTokenizer, METEOR 1.5 (+ paraphrase table),
# and SPICE 1.0 — mirroring the reference's own jar-acquisition seam
# (/root/reference/coco_caption/get_stanford_models.sh:5-6).
#
# Without the jars this framework still evaluates: the pure-Python PTB
# tokenizer is byte-compatible on the fixture corpus, METEOR(lite) covers
# the exact+stem stages (clearly labeled), and SPICE skips with a notice —
# exactly the reference's own behavior before ITS downloads run.  Run this
# in any egress-enabled environment to get official jar numbers instead.
#
# Override destinations with SICZ_TPU_CORENLP_JAR / SICZ_TPU_METEOR_JAR /
# SICZ_TPU_SPICE_JAR (the evalcap modules read those env vars first,
# falling back to jars sitting next to the module files, which is where
# this script puts them).
set -e

DIR="$(cd "$(dirname "$0")/.." && pwd -P)/simpleimagecaptionzoo_tpu/evalcap"
COCOCAP=https://raw.githubusercontent.com/tylin/coco-caption/master/pycocoevalcap

fetch() {  # fetch <url> <dest>
    if [ -f "$2" ]; then
        echo "found $(basename "$2")"
    else
        echo "downloading $(basename "$2") ..."
        if command -v wget >/dev/null 2>&1; then
            wget -q -O "$2.part" "$1"
        else
            curl -fsSL -o "$2.part" "$1"
        fi
        mv "$2.part" "$2"
    fi
}

# 1. Stanford CoreNLP 3.4.1 (PTBTokenizer), the exact version the
#    reference pins (cider/pyciderevalcap/tokenizer/ptbtokenizer.py:23)
fetch "https://repo1.maven.org/maven2/edu/stanford/nlp/stanford-corenlp/3.4.1/stanford-corenlp-3.4.1.jar" \
      "$DIR/stanford-corenlp-3.4.1.jar"

# 2. METEOR 1.5 jar + paraphrase table (coco_caption vendors these;
#    meteor.py runs the jar with cwd=jar-dir expecting data/paraphrase-en.gz)
fetch "$COCOCAP/meteor/meteor-1.5.jar" "$DIR/meteor-1.5.jar"
mkdir -p "$DIR/data"
fetch "$COCOCAP/meteor/data/paraphrase-en.gz" "$DIR/data/paraphrase-en.gz"

# 3. SPICE 1.0 (needs CoreNLP 3.6.0 jars beside it, same layout the
#    reference's get_stanford_models.sh produces)
if [ -f "$DIR/spice-1.0.jar" ]; then
    echo "found spice-1.0.jar"
else
    echo "downloading SPICE-1.0.zip ..."
    TMP=$(mktemp -d)
    fetch "https://panderson.me/images/SPICE-1.0.zip" "$TMP/SPICE-1.0.zip"
    unzip -q -o "$TMP/SPICE-1.0.zip" -d "$TMP"
    cp "$TMP/SPICE-1.0/spice-1.0.jar" "$DIR/"
    [ -d "$TMP/SPICE-1.0/lib" ] && cp -r "$TMP/SPICE-1.0/lib" "$DIR/"
    rm -rf "$TMP"
    CORENLP=stanford-corenlp-full-2015-12-09
    echo "downloading CoreNLP 3.6.0 (SPICE dependency) ..."
    TMP=$(mktemp -d)
    fetch "http://nlp.stanford.edu/software/$CORENLP.zip" "$TMP/$CORENLP.zip"
    unzip -q "$TMP/$CORENLP.zip" -d "$TMP"
    mkdir -p "$DIR/lib"
    cp "$TMP/$CORENLP/stanford-corenlp-3.6.0.jar" \
       "$TMP/$CORENLP/stanford-corenlp-3.6.0-models.jar" "$DIR/lib/"
    rm -rf "$TMP"
fi

echo "done. jar status:"
for j in stanford-corenlp-3.4.1.jar meteor-1.5.jar spice-1.0.jar; do
    [ -f "$DIR/$j" ] && echo "  $j: OK" || echo "  $j: MISSING"
done
