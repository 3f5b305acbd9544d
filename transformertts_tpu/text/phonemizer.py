"""Host-side phonemization (grapheme → IPA).

Mirrors the reference frontend semantics (data/text/tokenizer.py:50-106):
hyphen protection, punctuation preservation, unknown-symbol filtering and
whitespace collapsing — but with pluggable backends:

- ``espeak``: shells out to the espeak/espeak-ng binary when present
  (the reference used the espeak C library through the ``phonemizer``
  package; the subprocess keeps the same host-side boundary).
- ``builtin``: dependency-free rule-based G2P (``g2p.py``).

Backend is auto-detected unless forced.
"""
import re
import shutil
import subprocess
from functools import lru_cache
from typing import Callable, Union

from transformertts_tpu.text.symbols import all_phonemes, _punctuations
from transformertts_tpu.text import g2p

_KNOWN_SYMBOLS = frozenset(all_phonemes)
# one or more whitespace chars, optionally hugging a punctuation mark
_WS = re.compile(r'\s+')
_WS_AROUND_PUNCT = re.compile(r'\s*([' + _punctuations + r'])\s*')


@lru_cache(maxsize=1)
def _find_espeak() -> str:
    for name in ('espeak-ng', 'espeak'):
        path = shutil.which(name)
        if path:
            return path
    return ''


def _per_string(fn: Callable[[str], str], text: Union[str, list]
                ) -> Union[str, list]:
    """Apply ``fn`` to a string or elementwise to a list of strings."""
    if isinstance(text, str):
        return fn(text)
    if isinstance(text, list):
        return [fn(t) for t in text]
    raise TypeError(f'phonemizer input must be list or str, not {type(text)}')


class Phonemizer:

    def __init__(self, language: str, with_stress: bool, njobs: int = 4, backend: str = 'auto'):
        self.language = language
        self.njobs = njobs
        self.with_stress = with_stress
        self.special_hyphen = '—'
        self.punctuation = ';:,.!?¡¿—…"«»“”'
        if backend == 'auto':
            backend = 'espeak' if _find_espeak() else 'builtin'
        if backend == 'espeak' and not _find_espeak():
            raise RuntimeError('espeak backend requested but no espeak binary found on host')
        self.backend = backend

    def __call__(self, text: Union[str, list], with_stress=None, njobs=None,
                 language=None) -> Union[str, list]:
        language = language or self.language
        with_stress = self.with_stress if with_stress is None else with_stress
        njobs = self.njobs if njobs is None else njobs
        text = _per_string(self._shield_hyphens, text)
        if isinstance(text, list) and njobs > 1 and len(text) > 1 \
                and self.backend == 'espeak':
            # espeak runs as a subprocess per clause — threads parallelize
            # the process waits (the builtin G2P is pure CPU Python, where
            # threads would not help)
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=njobs) as pool:
                phonemes = list(pool.map(
                    lambda t: self._phonemize_string(t, language, with_stress),
                    text))
        else:
            phonemes = _per_string(
                lambda t: self._phonemize_string(t, language, with_stress),
                text)
        return _per_string(self._clean_phonemes, phonemes)

    # backends ---------------------------------------------------------------

    def _phonemize_string(self, text: str, language: str, with_stress: bool) -> str:
        if self.backend == 'espeak':
            return self._espeak(text, language, with_stress)
        return g2p.g2p_sentence(text, with_stress=with_stress)

    def _espeak(self, text: str, language: str, with_stress: bool) -> str:
        # espeak emits IPA directly with --ipa; punctuation must be
        # re-attached because espeak drops it, so phonemize clause by clause.
        binary = _find_espeak()
        clauses = re.split(f'([{re.escape(self.punctuation)}])', text)
        out = []
        for clause in clauses:
            if not clause.strip():
                continue
            if clause in self.punctuation:
                out.append(clause)
                continue
            result = subprocess.run(
                [binary, '-q', '--ipa', '-v', language, clause],
                capture_output=True, text=True, check=True)
            ipa = result.stdout.strip().replace('\n', ' ')
            if not with_stress:
                ipa = ipa.replace('ˈ', '').replace('ˌ', '')
            out.append(ipa)
        return ' '.join(out)

    # pre/post-processing (reference-parity semantics) ------------------------

    def _shield_hyphens(self, text: str) -> str:
        # phonemization backends treat '-' as a word break; stand in an
        # em-dash (which survives as punctuation) and swap it back after
        return text.replace('-', self.special_hyphen)

    def _clean_phonemes(self, text: str) -> str:
        """Restore hyphens, drop out-of-inventory symbols, normalize spacing.

        Spacing rule: runs of whitespace become one space, and whitespace
        touching a punctuation mark is absorbed into it (``a , b`` → ``a,b``).
        """
        text = text.replace(self.special_hyphen, '-')
        text = ''.join(c for c in text if c in _KNOWN_SYMBOLS)
        text = _WS_AROUND_PUNCT.sub(r'\1', _WS.sub(' ', text))
        return text.strip()
