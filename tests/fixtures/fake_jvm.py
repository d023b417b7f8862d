"""Golden-transcript fake JVM for the jar-protocol clients.

Replays the stdio/file protocols of the three Java tools the eval stack
shells out to (hand-authored from the protocol shapes in the reference:
coco_caption/pycocoevalcap/meteor/meteor.py:25-56, tokenizer/
ptbtokenizer.py:31-68, spice/spice.py:72-79), so the CLIENT code in
simpleimagecaptionzoo_tpu/evalcap is exercised end-to-end without a JVM
(tests/test_eval_jars.py).  Dispatches on argv exactly as the clients
build it; any deviation from the expected argv shape exits non-zero,
which the tests surface as a protocol regression.

If FAKE_JVM_LOG is set, every interaction is appended there as JSON lines
for the tests to assert on.
"""
import json
import os
import sys


def log(kind, payload):
    path = os.environ.get("FAKE_JVM_LOG")
    if path:
        with open(path, "a") as f:
            f.write(json.dumps({"kind": kind, "payload": payload}) + "\n")


# CoreNLP PTBTokenizer golden emissions (-preserveLines -lowerCase):
# exact input line -> exact stdout line, println-terminated like the jar.
PTB_GOLDEN = {
    "A man riding a horse.": "a man riding a horse .",
    "Don't stop, it's fun!": "do n't stop , it 's fun !",
    '"Quoted" text here': "`` quoted '' text here",
    "two  spaces   collapse": "two spaces collapse",
    "...": "...",
    "a close-up of food": "a close-up of food",
}


def ptb_main(args):
    # argv: -cp <jar> edu.stanford.nlp.process.PTBTokenizer
    #       -preserveLines -lowerCase <tempfile>
    if args[2] != "edu.stanford.nlp.process.PTBTokenizer":
        sys.exit(3)
    if args[3:5] != ["-preserveLines", "-lowerCase"]:
        sys.exit(3)
    with open(args[5]) as f:
        lines = f.read().split("\n")
    log("ptb", {"lines": lines})
    for line in lines:
        if line not in PTB_GOLDEN:
            sys.exit(4)                    # un-scripted input: fail loudly
        print(PTB_GOLDEN[line])            # println: trailing \n on last
    sys.exit(0)


def meteor_stats(refs, hyp):
    """Deterministic fake '-stdio' SCORE reply (real jar: a line of
    space-separated segment statistics, opaque to the client)."""
    return f"{len(refs)} {len(hyp.split())}"


def meteor_seg_score(stats):
    a, b = (int(x) for x in stats.split())
    return (a * 100 + b) / 10000.0


def meteor_main(args):
    # argv: -jar -Xmx2G <jar> - - -stdio -l en -norm
    if args[3:9] != ["-", "-", "-stdio", "-l", "en", "-norm"]:
        sys.exit(3)
    for raw in sys.stdin:
        line = raw.rstrip("\n")
        parts = line.split(" ||| ")
        log("meteor", {"line": line})
        if parts[0] == "SCORE":
            refs, hyp = parts[1:-1], parts[-1]
            print(meteor_stats(refs, hyp), flush=True)
        elif parts[0] == "EVAL":
            segs = [meteor_seg_score(s) for s in parts[1:]]
            for s in segs:
                print(s, flush=True)
            print(sum(segs) / len(segs), flush=True)
        else:
            sys.exit(4)
    sys.exit(0)


def spice_main(args):
    # argv: -jar -Xmx8G <jar> <in> -cache <dir> -out <out> -subset -silent
    in_path = args[3]
    opts = args[4:]
    if opts[0] != "-cache" or opts[2] != "-out" or \
            opts[4:] != ["-subset", "-silent"]:
        sys.exit(3)
    out_path = opts[3]
    with open(in_path) as f:
        data = json.load(f)
    log("spice", {"input": data})
    results = []
    for item in data:
        if set(item) != {"image_id", "tests", "refs"}:
            sys.exit(4)
        f_score = len(item["tests"][0].split()) / 10.0
        results.append({"image_id": item["image_id"],
                        "scores": {"All": {"f": f_score, "p": 0.5, "r": 0.5},
                                   "Object": {"f": f_score / 2,
                                              "p": 0.25, "r": 0.25}}})
    results.reverse()      # clients must map by image_id, never by order
    with open(out_path, "w") as f:
        json.dump(results, f)
    sys.exit(0)


def main():
    args = sys.argv[1:]
    if args and args[0] == "-cp":
        ptb_main(args)
    if args[:2] == ["-jar", "-Xmx2G"]:
        meteor_main(args)
    if args[:2] == ["-jar", "-Xmx8G"]:
        spice_main(args)
    sys.exit(2)


if __name__ == "__main__":
    main()
