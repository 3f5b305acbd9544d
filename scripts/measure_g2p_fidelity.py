"""How far is the builtin G2P fallback from espeak?

Two measurements (VERDICT r3 item 7; reference uses the espeak C library,
/root/reference/data/text/tokenizer.py:66-74):

1. **Fixture agreement** — symbol-level similarity of the builtin G2P
   (text/g2p.py) against the frozen espeak-ng en-us fixture
   (tests/fixtures/espeak_en_us_ipa.tsv; see its provenance header — it is
   hand-transcribed, approximate ground truth). Reported as normalized
   Levenshtein similarity over IPA codepoints, exact-match rate, and the
   same with stress marks stripped (stress placement is the most
   convention-sensitive part of espeak output).
2. **Corpus path rates** — over real English prose
   (tests/fixtures/g2p_corpus_sample.txt by default): what fraction of word
   tokens hit the curated lexicon vs fall through to letter-to-sound rules,
   plus the rate of characters the rules cannot map (dropped).

Usage: python scripts/measure_g2p_fidelity.py [--text FILE] [--json]
"""
import argparse
import json
import re
import sys
import unicodedata
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from transformertts_tpu.text import g2p  # noqa: E402

FIXTURE = Path(__file__).parent.parent / 'tests/fixtures/espeak_en_us_ipa.tsv'
CORPUS = Path(__file__).parent.parent / 'tests/fixtures/g2p_corpus_sample.txt'

_WORD_RE = re.compile(r"[a-zA-Z']+")


def levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def similarity(a: str, b: str) -> float:
    """1 - normalized edit distance over NFC codepoints."""
    a = unicodedata.normalize('NFC', a)
    b = unicodedata.normalize('NFC', b)
    if not a and not b:
        return 1.0
    return 1.0 - levenshtein(a, b) / max(len(a), len(b))


def strip_stress(s: str) -> str:
    return s.replace('ˈ', '').replace('ˌ', '')


def load_fixture():
    pairs = []
    for line in FIXTURE.read_text().splitlines():
        if not line.strip() or line.startswith('#'):
            continue
        word, ipa = line.split('\t')
        pairs.append((word, ipa))
    return pairs


def fixture_agreement():
    pairs = load_fixture()
    sims, sims_ns, exact, exact_ns = [], [], 0, 0
    by_path = {'lexicon': [], 'lexicon_possessive': [], 'cmudict': [],
               'cmudict_inflected': [], 'rules': []}
    worst = []
    for word, ref_ipa in pairs:
        got = g2p.g2p_word(word, with_stress=True)
        s = similarity(got, ref_ipa)
        s_ns = similarity(strip_stress(got), strip_stress(ref_ipa))
        sims.append(s)
        sims_ns.append(s_ns)
        exact += got == ref_ipa
        exact_ns += strip_stress(got) == strip_stress(ref_ipa)
        by_path[g2p.g2p_word_path(word)].append(s_ns)
        worst.append((s_ns, word, got, ref_ipa))
    worst.sort()
    n = len(pairs)
    return {
        'n_words': n,
        'mean_symbol_similarity': round(sum(sims) / n, 4),
        'mean_symbol_similarity_no_stress': round(sum(sims_ns) / n, 4),
        'exact_match_rate': round(exact / n, 4),
        'exact_match_rate_no_stress': round(exact_ns / n, 4),
        'by_path': {k: {'n': len(v),
                        'mean_similarity_no_stress':
                            round(sum(v) / len(v), 4) if v else None}
                    for k, v in by_path.items()},
        'worst10': [{'word': w, 'builtin': g, 'espeak': r,
                     'similarity': round(s, 3)}
                    for s, w, g, r in worst[:10]],
    }


def corpus_rates(text_path: Path):
    words = []
    for line in text_path.read_text().splitlines():
        if line.startswith('#'):
            continue
        words.extend(w.lower() for w in _WORD_RE.findall(line))
    counts = {'lexicon': 0, 'lexicon_possessive': 0, 'cmudict': 0,
              'cmudict_inflected': 0, 'rules': 0}
    dropped_chars = 0
    total_chars = 0
    rule_types = set()
    for w in words:
        path = g2p.g2p_word_path(w)
        counts[path] += 1
        if path == 'rules':
            rule_types.add(w)
            base = w.replace("'", '')
            total_chars += len(base)
            # chars the rule loop advances past without emitting anything
            # are dropped (g2p._apply_rules's final else branch)
            ipa = g2p._apply_rules(base)
            if not ipa:
                dropped_chars += len(base)
    n = len(words)
    lex_total = n - counts['rules']
    return {
        'n_word_tokens': n,
        'n_word_types': len(set(words)),
        'lexicon_hit_rate': round(counts['lexicon'] / n, 4),
        'lexicon_possessive_rate': round(counts['lexicon_possessive'] / n, 4),
        'cmudict_hit_rate': round(counts['cmudict'] / n, 4),
        'cmudict_inflected_rate': round(counts['cmudict_inflected'] / n, 4),
        'lexicon_any_rate': round(lex_total / n, 4),
        'rule_path_rate': round(counts['rules'] / n, 4),
        'rule_path_types': len(rule_types),
        'fully_unmapped_word_rate': round(dropped_chars and
                                          dropped_chars / max(total_chars, 1),
                                          6),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--text', type=Path, default=CORPUS,
                    help='corpus text for path-rate measurement '
                         '(default: bundled public-domain sample)')
    args = ap.parse_args()
    out = {'fixture_agreement': fixture_agreement(),
           'corpus_rates': corpus_rates(args.text)}
    print(json.dumps(out, ensure_ascii=False, indent=2))


if __name__ == '__main__':
    main()
