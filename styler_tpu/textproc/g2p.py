"""Grapheme-to-phoneme conversion.

The reference shells into the ``g2p_en`` neural package at synthesis time
(reference synthesize.py:9,44-58). That package (and its weights) is not
available offline, so this module provides a layered G2P with the same
output contract — a list of ARPAbet tokens and punctuation marks:

1. a user-supplied CMU pronouncing dictionary (``load_cmudict``), used
   verbatim when present (this also covers MFA's librispeech lexicon),
2. a built-in exception lexicon of common irregular words,
3. a deterministic letter-to-sound rule engine for out-of-vocabulary
   words (longest-match grapheme chunk rules with positional context).

``to_phoneme_string`` reproduces the exact formatting of the reference's
``preprocess_text`` (synthesize.py:44-58): ``{AH0 M ...}`` spans with
``{sp}`` standing in for punctuation.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

# Small exception lexicon: words whose spelling defeats the rules.
_LEXICON: Dict[str, str] = {
    "a": "AH0", "the": "DH AH0", "of": "AH1 V", "to": "T UW1",
    "and": "AH0 N D", "was": "W AA1 Z", "is": "IH1 Z", "are": "AA1 R",
    "were": "W ER1", "be": "B IY1", "been": "B IH1 N", "have": "HH AE1 V",
    "has": "HH AE1 Z", "had": "HH AE1 D", "do": "D UW1", "does": "D AH1 Z",
    "done": "D AH1 N", "says": "S EH1 Z", "said": "S EH1 D",
    "one": "W AH1 N", "once": "W AH1 N S", "two": "T UW1",
    "who": "HH UW1", "whose": "HH UW1 Z", "whom": "HH UW1 M",
    "what": "W AH1 T", "where": "W EH1 R", "there": "DH EH1 R",
    "their": "DH EH1 R", "they": "DH EY1", "you": "Y UW1",
    "your": "Y AO1 R", "he": "HH IY1", "she": "SH IY1", "we": "W IY1",
    "me": "M IY1", "my": "M AY1", "i": "AY1", "eye": "AY1",
    "would": "W UH1 D", "could": "K UH1 D", "should": "SH UH1 D",
    "through": "TH R UW1", "though": "DH OW1", "thought": "TH AO1 T",
    "enough": "IH0 N AH1 F", "tough": "T AH1 F", "rough": "R AH1 F",
    "laugh": "L AE1 F", "cough": "K AO1 F",
    "people": "P IY1 P AH0 L", "women": "W IH1 M AH0 N",
    "woman": "W UH1 M AH0 N", "water": "W AO1 T ER0",
    "again": "AH0 G EH1 N", "against": "AH0 G EH1 N S T",
    "any": "EH1 N IY0", "many": "M EH1 N IY0",
    "busy": "B IH1 Z IY0", "business": "B IH1 Z N AH0 S",
    "pretty": "P R IH1 T IY0", "very": "V EH1 R IY0",
    "only": "OW1 N L IY0", "other": "AH1 DH ER0",
    "mother": "M AH1 DH ER0", "father": "F AA1 DH ER0",
    "brother": "B R AH1 DH ER0", "son": "S AH1 N", "come": "K AH1 M",
    "some": "S AH1 M", "none": "N AH1 N", "nothing": "N AH1 TH IH0 NG",
    "something": "S AH1 M TH IH0 NG", "money": "M AH1 N IY0",
    "love": "L AH1 V", "above": "AH0 B AH1 V", "move": "M UW1 V",
    "prove": "P R UW1 V", "lose": "L UW1 Z", "whole": "HH OW1 L",
    "heart": "HH AA1 R T", "great": "G R EY1 T", "break": "B R EY1 K",
    "steak": "S T EY1 K", "eight": "EY1 T", "weight": "W EY1 T",
    "height": "HH AY1 T", "island": "AY1 L AH0 N D",
    "friend": "F R EH1 N D", "give": "G IH1 V", "live": "L IH1 V",
    "sure": "SH UH1 R", "sugar": "SH UH1 G ER0",
    "machine": "M AH0 SH IY1 N", "police": "P AH0 L IY1 S",
    "world": "W ER1 L D", "word": "W ER1 D", "work": "W ER1 K",
    "worth": "W ER1 TH", "early": "ER1 L IY0", "earth": "ER1 TH",
    "heard": "HH ER1 D", "learn": "L ER1 N", "search": "S ER1 CH",
    "answer": "AE1 N S ER0", "often": "AO1 F AH0 N",
    "listen": "L IH1 S AH0 N", "castle": "K AE1 S AH0 L",
    "half": "HH AE1 F", "calm": "K AA1 M", "talk": "T AO1 K",
    "walk": "W AO1 K", "know": "N OW1", "knew": "N UW1",
    "write": "R AY1 T", "wrong": "R AO1 NG", "hour": "AW1 ER0",
    "honest": "AA1 N AH0 S T", "honor": "AA1 N ER0",
    "one's": "W AH1 N Z", "ocean": "OW1 SH AH0 N",
    "special": "S P EH1 SH AH0 L", "social": "S OW1 SH AH0 L",
    "nation": "N EY1 SH AH0 N", "question": "K W EH1 S CH AH0 N",
    "caught": "K AO1 T", "daughter": "D AO1 T ER0",
    "bought": "B AO1 T", "brought": "B R AO1 T",
    "beautiful": "B Y UW1 T AH0 F AH0 L", "use": "Y UW1 Z",
    "used": "Y UW1 Z D", "usual": "Y UW1 ZH AH0 W AH0 L",
    "europe": "Y UH1 R AH0 P", "union": "Y UW1 N Y AH0 N",
    "view": "V Y UW1", "few": "F Y UW1", "new": "N UW1",
    "into": "IH1 N T UW0", "onto": "AA1 N T UW0",
    "want": "W AA1 N T", "watch": "W AA1 CH",
    "war": "W AO1 R", "warm": "W AO1 R M",
}

# Longest-match grapheme → phoneme chunk rules.
# Each entry: (grapheme, phonemes). Position-specific variants are handled
# in code (word-final 'e' silent, final 'ed'/'es', initial clusters).
_CHUNKS = [
    ("tion", "SH AH0 N"), ("sion", "ZH AH0 N"), ("cially", "SH AH0 L IY0"),
    ("cial", "SH AH0 L"), ("tial", "SH AH0 L"), ("cious", "SH AH0 S"),
    ("tious", "SH AH0 S"), ("ought", "AO1 T"), ("aught", "AO1 T"),
    ("eigh", "EY1"), ("igh", "AY1"), ("tch", "CH"), ("dge", "JH"),
    ("ph", "F"), ("gh", "G"), ("ch", "CH"), ("sh", "SH"), ("th", "TH"),
    ("wh", "W"), ("ck", "K"), ("ng", "NG"), ("qu", "K W"), ("wr", "R"),
    ("kn", "N"), ("gn", "N"), ("mb", "M"), ("ps", "S"),
    ("oo", "UW1"), ("ee", "IY1"), ("ea", "IY1"), ("ai", "EY1"),
    ("ay", "EY1"), ("oa", "OW1"), ("ow", "OW1"), ("ou", "AW1"),
    ("oi", "OY1"), ("oy", "OY1"), ("au", "AO1"), ("aw", "AO1"),
    ("ew", "UW1"), ("ue", "UW1"), ("ui", "UW1"), ("ie", "IY1"),
    ("ar", "AA1 R"), ("er", "ER0"), ("ir", "ER1"), ("or", "AO1 R"),
    ("ur", "ER1"),
    ("a", "AE1"), ("b", "B"), ("c", "K"), ("d", "D"), ("e", "EH1"),
    ("f", "F"), ("g", "G"), ("h", "HH"), ("i", "IH1"), ("j", "JH"),
    ("k", "K"), ("l", "L"), ("m", "M"), ("n", "N"), ("o", "AA1"),
    ("p", "P"), ("r", "R"), ("s", "S"), ("t", "T"), ("u", "AH1"),
    ("v", "V"), ("w", "W"), ("x", "K S"), ("y", "IY0"), ("z", "Z"),
]

_word_re = re.compile(r"[a-zA-Z']+|[^a-zA-Z\s]")


class G2p:
    """Callable G2P matching the g2p_en interface: g2p(text) -> token list."""

    def __init__(self, cmudict_path: Optional[str] = None):
        self.lexicon = dict(_LEXICON)
        if cmudict_path:
            self.load_cmudict(cmudict_path)

    def load_cmudict(self, path: str) -> None:
        """Load a CMUdict-format lexicon ('WORD  PH PH PH' lines)."""
        alt = re.compile(r"\([0-9]+\)$")
        with open(path, encoding="latin-1") as f:
            for line in f:
                if not line or line[0] in ";#":
                    continue
                parts = line.strip().split(None, 1)
                if len(parts) != 2:
                    continue
                word = alt.sub("", parts[0]).lower()
                if word not in self.lexicon or "(" not in parts[0]:
                    self.lexicon.setdefault(word, parts[1].strip())

    def _rules(self, word: str) -> List[str]:
        word = word.replace("'", "")
        # Final silent 'e' (not in short words like 'be', handled by lexicon).
        if len(word) > 3 and word.endswith("e") and word[-2] not in "aeiou":
            word = word[:-1]
        phones: List[str] = []
        i = 0
        n = len(word)
        while i < n:
            matched = False
            for graph, ph in _CHUNKS:
                if word.startswith(graph, i):
                    # word-final 's' after voiced sound -> Z
                    if graph == "s" and i == n - 1 and phones and phones[-1] not in (
                        "P", "T", "K", "F", "TH", "S", "SH", "CH",
                    ):
                        phones.append("Z")
                    else:
                        phones.extend(ph.split())
                    i += len(graph)
                    matched = True
                    break
            if not matched:
                i += 1  # drop unknown character
        # demote all but the first primary stress
        seen_primary = False
        out = []
        for p in phones:
            if p.endswith("1"):
                if seen_primary:
                    p = p[:-1] + "0"
                seen_primary = True
            out.append(p)
        return out

    def __call__(self, text: str) -> List[str]:
        tokens: List[str] = []
        first = True
        for m in _word_re.finditer(text):
            tok = m.group(0)
            if not first:
                tokens.append(" ")
            first = False
            if tok[0].isalpha() or tok[0] == "'":
                key = tok.lower()
                if key in self.lexicon:
                    tokens.extend(self.lexicon[key].split())
                else:
                    tokens.extend(self._rules(key))
            else:
                tokens.append(tok)
        return tokens


def to_phoneme_string(text: str, g2p: Optional[G2p] = None) -> str:
    """Reference preprocess_text formatting (synthesize.py:44-58):
    '{PH} {PH} ... {sp} ...' with punctuation mapped to {sp}."""
    import string

    text = text.rstrip(string.punctuation)
    g2p = g2p or G2p()
    phones = [p for p in g2p(text) if p != " "]
    s = "{" + "}{".join(phones) + "}"
    s = re.sub(r"\{[^\w\s]?\}", "{sp}", s)
    return s.replace("}{", " ")
