"""Induce the letter-to-sound correction table from the curated lexicon.

Runs the error-driven TBL induction (styler_tpu/textproc/lts.py) over
every alphabetic lexicon entry and writes the adopted rules as the
generated module ``styler_tpu/textproc/lts_rules.py`` that G2p loads at
construction. Reports before/after metrics on the pinned adversarial
OOV holdout (tests/test_textproc.py::test_g2p_adversarial_holdout) and
leave-one-out lexicon accuracy, so threshold changes are measurable.

Usage:
  python tools/induce_lts.py [--min_support 2] [--dry_run]
  python -m pytest tests/test_textproc.py -q   # full gates afterwards
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the pinned adversarial holdout (keep in sync with
# tests/test_textproc.py::test_g2p_adversarial_holdout)
ADVERSARIAL = {
    "lieutenant": "L UW0 T EH1 N AH0 N T",
    "bologna": "B AH0 L OW1 N IY0",
    "indict": "IH0 N D AY1 T",
    "corps": "K AO1 R",
    "cupboard": "K AH1 B ER0 D",
    "handsome": "HH AE1 N S AH0 M",
    "epitome": "IH0 P IH1 T AH0 M IY0",
    "facade": "F AH0 S AA1 D",
    "croissant": "K R AH0 S AA1 N T",
    "silhouette": "S IH2 L UW0 EH1 T",
    "camouflage": "K AE1 M AH0 F L AA2 ZH",
    "coup": "K UW1",
    "depot": "D IY1 P OW0",
    "mortgage": "M AO1 R G AH0 JH",
    "asthma": "AE1 Z M AH0",
    "czar": "Z AA1 R",
    "gauge": "G EY1 JH",
    "fatigue": "F AH0 T IY1 G",
    "plaid": "P L AE1 D",
    "suede": "S W EY1 D",
    "gourmet": "G UH0 R M EY1",
    "leicester": "L EH1 S T ER0",
    "yosemite": "Y OW0 S EH1 M IH0 T IY0",
    "siobhan": "SH AH0 V AO1 N",
}


# the pinned regular-word holdout (keep in sync with
# tests/test_textproc.py::test_g2p_holdout_rule_accuracy)
REGULAR = {
    "brick": "B R IH1 K", "stamp": "S T AE1 M P", "crisp": "K R IH1 S P",
    "twig": "T W IH1 G", "blend": "B L EH1 N D", "drift": "D R IH1 F T",
    "glint": "G L IH1 N T", "stump": "S T AH1 M P", "shelf": "SH EH1 L F",
    "sprint": "S P R IH1 N T", "wick": "W IH1 K", "chat": "CH AE1 T",
    "dock": "D AA1 K", "fern": "F ER1 N", "surf": "S ER1 F",
    "burst": "B ER1 S T", "charm": "CH AA1 R M", "gleam": "G L IY1 M",
    "roast": "R OW1 S T", "coast": "K OW1 S T", "sprout": "S P R AW1 T",
    "mount": "M AW1 N T", "claw": "K L AO1", "haul": "HH AO1 L",
    "coil": "K OY1 L", "joint": "JH OY1 N T", "gloom": "G L UW1 M",
    "creek": "K R IY1 K", "sweet": "S W IY1 T", "paint": "P EY1 N T",
    "maid": "M EY1 D", "glow": "G L OW1", "bolt": "B OW1 L T",
    "mild": "M AY1 L D", "thorn": "TH AO1 R N", "stitch": "S T IH1 CH",
    "badge": "B AE1 JH", "knit": "N IH1 T", "wrap": "R AE1 P",
    "quilt": "K W IH1 L T", "grill": "G R IH1 L", "snack": "S N AE1 K",
    "twist": "T W IH1 S T", "plum": "P L AH1 M", "strap": "S T R AE1 P",
    "crust": "K R AH1 S T", "flock": "F L AA1 K", "blink": "B L IH1 NG K",
    "clamp": "K L AE1 M P", "stack": "S T AE1 K", "smash": "S M AE1 SH",
    "drum": "D R AH1 M", "shrimp": "SH R IH1 M P", "swift": "S W IH1 F T",
    "flute": "F L UW1 T", "grape": "G R EY1 P", "pride": "P R AY1 D",
    "cube": "K Y UW1 B", "theme": "TH IY1 M", "spine": "S P AY1 N",
    "crane": "K R EY1 N", "globe": "G L OW1 B", "plume": "P L UW1 M",
    "strive": "S T R AY1 V", "quote": "K W OW1 T",
    "slope": "S L OW1 P", "brake": "B R EY1 K", "prune": "P R UW1 N",
    "stripe": "S T R AY1 P", "froze": "F R OW1 Z",
    "trusted": "T R AH1 S T IH0 D", "spelling": "S P EH1 L IH0 NG",
    "blocked": "B L AA1 K T", "slides": "S L AY1 D Z",
    "stoves": "S T OW1 V Z", "printer": "P R IH1 N T ER0",
    "jumping": "JH AH1 M P IH0 NG", "blends": "B L EH1 N D Z",
    "smiled": "S M AY1 L D", "hoped": "HH OW1 P T",
    "dined": "D AY1 N D", "rained": "R EY1 N D",
    "plotted": "P L AA1 T IH0 D", "grabbing": "G R AE1 B IH0 NG",
    "dusty": "D AH1 S T IY0", "darkness": "D AA1 R K N AH0 S",
    "hopeful": "HH OW1 P F AH0 L", "helpless": "HH EH1 L P L AH0 S",
    "coldest": "K OW1 L D AH0 S T", "greenish": "G R IY1 N IH0 SH",
    "slowly": "S L OW1 L IY0", "payment": "P EY1 M AH0 N T",
    "brightness": "B R AY1 T N AH0 S", "grills": "G R IH1 L Z",
    "stamps": "S T AE1 M P S", "drums": "D R AH1 M Z",
    "roasted": "R OW1 S T IH0 D", "twisting": "T W IH1 S T IH0 NG",
    "lamp's": "L AE1 M P S", "flame's": "F L EY1 M Z",
    "graph": "G R AE1 F", "phone": "F OW1 N",
    "munch": "M AH1 N CH", "quench": "K W EH1 N CH",
    "section": "S EH1 K SH AH0 N", "mention": "M EH1 N SH AH0 N",
}


def lev(a, b):
    import numpy as np

    d = np.zeros((len(a) + 1, len(b) + 1), int)
    d[:, 0] = range(len(a) + 1)
    d[0, :] = range(len(b) + 1)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            d[i, j] = min(
                d[i - 1, j] + 1,
                d[i, j - 1] + 1,
                d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[-1, -1]


def adversarial_scores(g2p):
    hits, acc = 0, 0.0
    for w, pron in ADVERSARIAL.items():
        out = g2p(w)
        gp = pron.split()
        hits += " ".join(out) == pron
        acc += max(0.0, 1.0 - lev(out, gp) / len(gp))
    return acc / len(ADVERSARIAL), hits


def regular_score(g2p):
    return sum(
        " ".join(g2p(w)) == pron for w, pron in REGULAR.items()
    ) / len(REGULAR)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min_support", type=int, default=None)
    ap.add_argument("--min_error_rate", type=float, default=None)
    ap.add_argument("--min_consistency", type=float, default=None)
    ap.add_argument("--dry_run", action="store_true",
                    help="report metrics, do not write lts_rules.py")
    args = ap.parse_args()

    os.environ["STYLER_TPU_NO_LTS"] = "1"  # induce from the bare engine
    from styler_tpu.textproc import lts
    from styler_tpu.textproc.g2p import G2p, _normalize_stress_segs
    from styler_tpu.textproc.lexicon import LEXICON

    g2p = G2p(auto=False)
    assert g2p.lts is None

    # Closed-class exclusion: word-initial voiced th (DH) exists ONLY in
    # the the/them/those function-word class, which is always a lexicon
    # hit at runtime — training on it would teach a th→DH rule that is
    # wrong for every open-class word (theme, theory, thesis).
    words = sorted(
        w for w in LEXICON
        if w.isalpha() and not LEXICON[w].startswith("DH")
    )
    traces = []
    for w in words:
        w2, segs = g2p._rules_segs(w)
        segs = _normalize_stress_segs(segs)
        traces.append((w2, segs, LEXICON[w].split()))
    print(f"training words: {len(traces)} / {len(LEXICON)} lexicon entries")

    kw = {}
    if args.min_support is not None:
        kw["min_support"] = args.min_support
    if args.min_error_rate is not None:
        kw["min_error_rate"] = args.min_error_rate
    if args.min_consistency is not None:
        kw["min_consistency"] = args.min_consistency
    rules = lts.induce(traces, **kw)
    print(f"adopted rules: {len(rules)}")

    # before/after on the bare rule engine (lexicon/morphology disabled
    # for the holdout words by construction — they are OOV)
    base_acc, base_hits = adversarial_scores(g2p)
    base_reg = regular_score(g2p)
    g2p.lts = lts.LtsCorrector(rules)
    new_acc, new_hits = adversarial_scores(g2p)
    new_reg = regular_score(g2p)
    print(f"adversarial phoneme acc: {base_acc:.3f} -> {new_acc:.3f}")
    print(f"adversarial word-exact:  {base_hits}/24 -> {new_hits}/24")
    print(f"regular-holdout exact:   {base_reg:.3f} -> {new_reg:.3f}"
          f"  (gate >= 0.95)")
    if new_reg < 0.95:
        bad = {w: " ".join(g2p(w)) for w, p in REGULAR.items()
               if " ".join(g2p(w)) != p}
        print(f"  regressions: {bad}")

    # leave-one-in rule-engine accuracy over the lexicon itself (upper
    # bound sanity, not a gate: morphology/lexicon normally shadow this)
    def lex_acc(g):
        ok = 0
        for w in words:
            ok += " ".join(g._rules(w)) == LEXICON[w]
        return ok / len(words)

    g2p.lts = None
    a0 = lex_acc(g2p)
    g2p.lts = lts.LtsCorrector(rules)
    a1 = lex_acc(g2p)
    print(f"lexicon self-accuracy (rules path): {a0:.3f} -> {a1:.3f}")

    if args.dry_run:
        return

    out_path = os.path.join(REPO, "styler_tpu", "textproc", "lts_rules.py")
    lines = [
        '"""GENERATED by tools/induce_lts.py — do not edit by hand.',
        "",
        "Error-driven letter-to-sound correction rules induced from the",
        "curated lexicon (textproc/lexicon.py); see textproc/lts.py for",
        "the induction algorithm and adoption thresholds. Regenerate with",
        "`python tools/induce_lts.py` after lexicon changes.",
        '"""',
        "",
        "RULES = [",
    ]
    for (g, lc, rc, frm), out in sorted(rules.items()):
        val = "None" if out is None else repr(tuple(out))
        lines.append(f"    (({g!r}, {lc!r}, {rc!r}, {tuple(frm)!r}), {val}),")
    lines.append("]")
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path} ({len(rules)} rules)")


if __name__ == "__main__":
    main()
