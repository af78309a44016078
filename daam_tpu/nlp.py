"""Lightweight NLP layer: spaCy when available, rule-based fallback otherwise.

The reference uses spaCy (``en_core_web_md``) for three things (reference
``daam/utils.py:94-109``, ``daam/heatmap.py:125-141``, ``daam/run/demo.py:18-22``):
POS tags (ADJ/NOUN filters), lemmas (prompt filtering in the CLI), and
dependency relations (head/dep pairs for syntactic heat-map analysis).

This environment has no spaCy and no network, so we provide a small
deterministic rule-based tagger/lemmatizer/parser exposing the same duck-typed
surface (``Token.text/.pos_/.lemma_/.dep_/.head/.text_with_ws`` and iteration
over a ``Doc``).  If spaCy *is* importable (user-installed), it is preferred
automatically.
"""

from functools import lru_cache
from typing import List, Optional
import re

__all__ = ['cached_nlp', 'Token', 'Doc', 'pos_tag', 'lemmatize', 'nlp_backend']


_DETS = {'a', 'an', 'the', 'this', 'that', 'these', 'those', 'my', 'your', 'his',
         'her', 'its', 'our', 'their', 'some', 'any', 'no', 'every', 'each'}
_ADPS = {'in', 'on', 'at', 'by', 'for', 'with', 'about', 'against', 'between',
         'into', 'through', 'during', 'before', 'after', 'above', 'below', 'to',
         'from', 'up', 'down', 'of', 'off', 'over', 'under', 'across', 'near',
         'behind', 'beside', 'around', 'along', 'onto', 'upon', 'within',
         'without', 'toward', 'towards', 'inside', 'outside', 'beneath'}
_PRONOUNS = {'i', 'you', 'he', 'she', 'it', 'we', 'they', 'me', 'him', 'them',
             'us', 'mine', 'yours', 'hers', 'ours', 'theirs', 'himself',
             'herself', 'itself', 'myself', 'yourself', 'themselves', 'who',
             'whom', 'which', 'what', 'something', 'anything', 'nothing',
             'everything', 'someone', 'anyone', 'everyone'}
_CONJ = {'and', 'or', 'but', 'nor', 'so', 'yet'}
_AUX = {'is', 'are', 'was', 'were', 'be', 'been', 'being', 'am', 'has', 'have',
        'had', 'do', 'does', 'did', 'will', 'would', 'shall', 'should', 'can',
        'could', 'may', 'might', 'must'}
_NUM_WORDS = {'zero', 'one', 'two', 'three', 'four', 'five', 'six', 'seven',
              'eight', 'nine', 'ten', 'eleven', 'twelve', 'dozen', 'hundred',
              'thousand', 'million'}
_ADV_SUFFIX = ('ly',)
# Common adjectives that matter for the demo's ADJ-replacement counterfactual
# (colors, sizes, moods) plus adjective-like suffixes.
_COMMON_ADJ = {'red', 'orange', 'yellow', 'green', 'blue', 'purple', 'pink',
               'brown', 'black', 'white', 'gray', 'grey', 'golden', 'silver',
               'big', 'small', 'large', 'little', 'tiny', 'huge', 'tall',
               'short', 'long', 'old', 'young', 'new', 'angry', 'happy', 'sad',
               'bald', 'furry', 'fluffy', 'cute', 'scary', 'bright', 'dark',
               'shiny', 'wooden', 'metal', 'plastic', 'modern', 'ancient',
               'beautiful', 'ugly', 'fast', 'slow', 'hot', 'cold', 'warm',
               'yummy', 'delicious', 'good', 'bad', 'great', 'nice', 'wild',
               'giant', 'baby', 'open', 'closed', 'empty', 'full', 'clean',
               'dirty', 'wet', 'dry', 'round', 'square', 'fresh'}
_ADJ_SUFFIX = ('ous', 'ful', 'ive', 'able', 'ible', 'al', 'ish', 'less', 'ic', 'en')
_VERB_GERUND = re.compile(r'^[a-z]+ing$')
_VERB_PAST = re.compile(r'^[a-z]+ed$')

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


class Token:
    """Duck-typed stand-in for ``spacy.tokens.Token`` (subset used by DAAM)."""

    def __init__(self, text: str, idx: int, whitespace: str = ' '):
        self.text = text
        self.i = idx
        self.whitespace_ = whitespace
        self.pos_ = 'X'
        self.lemma_ = text.lower()
        self.dep_ = 'dep'
        self.head: 'Token' = self

    @property
    def text_with_ws(self) -> str:
        return self.text + self.whitespace_

    def __repr__(self):
        return f'Token({self.text!r}, pos={self.pos_}, dep={self.dep_})'

    def __str__(self):
        return self.text


class Doc:
    """Duck-typed stand-in for ``spacy.tokens.Doc``: a tagged, parsed token list."""

    def __init__(self, text: str, tokens: List[Token]):
        self.text = text
        self._tokens = tokens

    def __iter__(self):
        return iter(self._tokens)

    def __len__(self):
        return len(self._tokens)

    def __getitem__(self, i):
        return self._tokens[i]

    def __repr__(self):
        return f'Doc({self.text!r})'


def lemmatize(word: str) -> str:
    """Tiny English lemmatizer: plural nouns and inflected verbs → base form."""
    w = word.lower()
    if len(w) > 3:
        for suffix, repl in (('sses', 'ss'), ('ies', 'y'), ('ches', 'ch'),
                             ('shes', 'sh'), ('xes', 'x'), ('zes', 'z'), ('ses', 's')):
            if w.endswith(suffix):
                return w[: -len(suffix)] + repl
        if w.endswith('ing') and len(w) > 5:
            stem = w[:-3]
            if len(stem) > 2 and stem[-1] == stem[-2]:  # running -> run
                stem = stem[:-1]
            elif not any(c in 'aeiou' for c in stem[-2:]):
                stem += 'e'
            return stem
        if w.endswith('ed') and len(w) > 4:
            stem = w[:-2]
            if len(stem) > 2 and stem[-1] == stem[-2]:
                stem = stem[:-1]
            return stem
        if w.endswith('s') and not w.endswith(('ss', 'us', 'is')):
            return w[:-1]
    return w


def pos_tag(word: str, prev: Optional[str] = None) -> str:
    """Coarse universal-POS tag for one lowercase word."""
    w = word.lower()
    if not w or not any(c.isalnum() for c in w):
        return 'PUNCT'
    if w.isdigit() or w in _NUM_WORDS:
        return 'NUM'
    if w in _DETS:
        return 'DET'
    if w in _ADPS:
        return 'ADP'
    if w in _CONJ:
        return 'CCONJ'
    if w in _AUX:
        return 'AUX'
    if w in _PRONOUNS:
        return 'PRON'
    if w in _COMMON_ADJ:
        return 'ADJ'
    if w.endswith(_ADV_SUFFIX) and len(w) > 4:
        return 'ADV'
    if _VERB_GERUND.match(w) and prev not in ('DET',):
        return 'VERB'
    if _VERB_PAST.match(w) and len(w) > 4:
        return 'VERB'
    if w.endswith(_ADJ_SUFFIX) and len(w) > 4:
        return 'ADJ'
    return 'NOUN'


def _parse(tokens: List[Token]) -> None:
    """Attach a shallow dependency structure: the last NOUN of each noun phrase
    heads its modifiers (``det``/``amod``/``compound``); verbs become ROOT;
    other tokens attach to the nearest content word.  This is deliberately
    simple — it only needs to support DAAM's head/dep heat-map pairing."""
    root = None
    for tok in tokens:
        if tok.pos_ in ('VERB', 'AUX') and root is None:
            root = tok
    if root is None:
        nouns = [t for t in tokens if t.pos_ == 'NOUN']
        root = nouns[0] if nouns else (tokens[0] if tokens else None)
    if root is None:
        return
    root.dep_ = 'ROOT'
    root.head = root

    # Find the head noun for each position: next NOUN at-or-after i.
    n = len(tokens)
    next_noun: List[Optional[Token]] = [None] * n
    last = None
    for i in range(n - 1, -1, -1):
        if tokens[i].pos_ in ('NOUN', 'PROPN', 'PRON'):
            last = tokens[i]
        next_noun[i] = last

    for i, tok in enumerate(tokens):
        if tok is root:
            continue
        if tok.pos_ == 'DET' and next_noun[i] is not None and next_noun[i] is not tok:
            tok.dep_, tok.head = 'det', next_noun[i]
        elif tok.pos_ == 'ADJ' and next_noun[i] is not None and next_noun[i] is not tok:
            tok.dep_, tok.head = 'amod', next_noun[i]
        elif tok.pos_ == 'NUM' and next_noun[i] is not None and next_noun[i] is not tok:
            tok.dep_, tok.head = 'nummod', next_noun[i]
        elif tok.pos_ in ('NOUN', 'PROPN') and next_noun[i + 1 if i + 1 < n else i] is not None \
                and i + 1 < n and tokens[i + 1].pos_ in ('NOUN', 'PROPN'):
            tok.dep_, tok.head = 'compound', tokens[i + 1]
        elif tok.pos_ == 'ADP':
            tok.dep_, tok.head = 'prep', root
        elif tok.pos_ in ('NOUN', 'PROPN', 'PRON'):
            tok.dep_, tok.head = ('nsubj' if tok.i < root.i else 'obj'), root
        elif tok.pos_ == 'VERB':
            tok.dep_, tok.head = 'xcomp', root
        elif tok.pos_ == 'ADV':
            tok.dep_, tok.head = 'advmod', root
        elif tok.pos_ == 'PUNCT':
            tok.dep_, tok.head = 'punct', root
        else:
            tok.dep_, tok.head = 'dep', root


def _fallback_nlp(text: str) -> Doc:
    tokens: List[Token] = []
    pos = 0
    prev_tag = None
    for i, m in enumerate(_TOKEN_RE.finditer(text)):
        start, end = m.span()
        ws_end = end
        while ws_end < len(text) and text[ws_end].isspace():
            ws_end += 1
        tok = Token(m.group(), i, text[end:ws_end])
        tok.pos_ = pos_tag(tok.text, prev_tag)
        tok.lemma_ = lemmatize(tok.text)
        prev_tag = tok.pos_
        tokens.append(tok)
        pos = ws_end
    doc = Doc(text, tokens)
    _parse(tokens)
    return doc


_spacy_nlp = None
_spacy_checked = False


def nlp_backend() -> str:
    """Which backend ``cached_nlp`` uses: ``'spacy'`` or ``'fallback'``."""
    global _spacy_checked, _spacy_nlp
    if not _spacy_checked:
        _spacy_checked = True
        try:
            import spacy  # noqa: F401
            try:
                _spacy_nlp = spacy.load('en_core_web_md')
            except OSError:
                try:
                    _spacy_nlp = spacy.load('en_core_web_sm')
                except OSError:
                    _spacy_nlp = None
        except ImportError:
            _spacy_nlp = None
    return 'spacy' if _spacy_nlp is not None else 'fallback'


@lru_cache(maxsize=100000)
def cached_nlp(prompt: str, type: str = 'en_core_web_md'):
    """Parse ``prompt``, preferring spaCy; mirror of reference ``daam/utils.py:97-109``."""
    if nlp_backend() == 'spacy':
        return _spacy_nlp(prompt)
    return _fallback_nlp(prompt)
