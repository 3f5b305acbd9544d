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
from typing import List, Union

from transformertts_tpu.text.symbols import all_phonemes, _punctuations
from transformertts_tpu.text import g2p


@lru_cache(maxsize=1)
def _find_espeak() -> str:
    for name in ('espeak-ng', 'espeak'):
        path = shutil.which(name)
        if path:
            return path
    return ''


class Phonemizer:

    def __init__(self, language: str, with_stress: bool, njobs: int = 4, backend: str = 'auto'):
        self.language = language
        self.njobs = njobs
        self.with_stress = with_stress
        self.special_hyphen = '—'
        self.punctuation = ';:,.!?¡¿—…"«»“”'
        self._whitespace_re = re.compile(r'\s+')
        self._whitespace_punctuation_re = re.compile(f'\\s*([{_punctuations}])\\s*')
        if backend == 'auto':
            backend = 'espeak' if _find_espeak() else 'builtin'
        if backend == 'espeak' and not _find_espeak():
            raise RuntimeError('espeak backend requested but no espeak binary found on host')
        self.backend = backend

    def __call__(self, text: Union[str, list], with_stress=None, njobs=None,
                 language=None) -> Union[str, list]:
        language = language or self.language
        with_stress = self.with_stress if with_stress is None else with_stress
        text = self._preprocess(text)
        if isinstance(text, list):
            phonemes = [self._phonemize_string(t, language, with_stress) for t in text]
        else:
            phonemes = self._phonemize_string(text, language, with_stress)
        return self._postprocess(phonemes)

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

    # pre/post-processing (reference parity) ----------------------------------

    def _preprocess_string(self, text: str) -> str:
        # protect hyphens: phonemization treats '-' as a word break
        return text.replace('-', self.special_hyphen)

    def _preprocess(self, text: Union[str, list]) -> Union[str, list]:
        if isinstance(text, list):
            return [self._preprocess_string(t) for t in text]
        if isinstance(text, str):
            return self._preprocess_string(text)
        raise TypeError(f'{self} input must be list or str, not {type(text)}')

    def _collapse_whitespace(self, text: str) -> str:
        text = re.sub(self._whitespace_re, ' ', text)
        return re.sub(self._whitespace_punctuation_re, r'\1', text)

    def _postprocess_string(self, text: str) -> str:
        text = text.replace(self.special_hyphen, '-')
        text = ''.join([c for c in text if c in all_phonemes])
        text = self._collapse_whitespace(text)
        return text.strip()

    def _postprocess(self, text: Union[str, list]) -> Union[str, list]:
        if isinstance(text, list):
            return [self._postprocess_string(t) for t in text]
        if isinstance(text, str):
            return self._postprocess_string(text)
        raise TypeError(f'{self} input must be list or str, not {type(text)}')
