"""Fallback-NLP agreement measurement against curated goldens (VERDICT r2 #5).

The reference relies on spaCy ``en_core_web_md`` (``daam/utils.py:94-109``)
for the POS/lemma/dependency features (lemma prompt filter, cconj pools, demo
ADJ dropdown, ``dependency_relations``).  spaCy and its models are not
installable here, so ``daam_tpu.nlp`` ships a rule-based fallback; these
tests quantify it against 100 hand-curated COCO-style captions tagged with
UD v2 / spaCy conventions (``tests/fixtures/nlp_goldens.json``) and pin the
measured agreement as a regression floor.

Measured at round 3 (after the spaCy-convention parser upgrade): POS
agreement 0.996 token-level, UAS/LAS 1.00 over the 34 dependency-annotated
captions (printed by ``test_pos_agreement``/``test_dependency_attachment``);
the floors below are set with headroom so incidental vocab additions don't
flap the suite.
"""

import json
from pathlib import Path

import pytest

from daam_tpu.nlp import cached_nlp, lemmatize, pos_tag

FIXTURE = Path(__file__).parent / 'fixtures' / 'nlp_goldens.json'

# ADJ and NOUN drive the reference features (ADJ dropdown in the demo,
# noun heat-map queries); they get their own, stricter gates.
POS_FLOOR = 0.93
ADJ_RECALL_FLOOR = 0.90
NOUN_PRECISION_FLOOR = 0.90
# Dependency attachment over the 34 hand-annotated captions (spaCy
# en_core_web_md / UD-v2 conventions, pass-subtypes collapsed to their base
# labels).  Measured 0.99 at round 3; floors leave headroom for vocab churn.
UAS_FLOOR = 0.95
LAS_FLOOR = 0.93


@pytest.fixture(scope='module')
def goldens():
    return json.loads(FIXTURE.read_text())['captions']


def _tag_all(goldens):
    rows = []
    for entry in goldens:
        doc = cached_nlp(entry['text'])
        got = [(t.text, t.pos_) for t in doc]
        assert len(got) == len(entry['pos']), \
            f'tokenization mismatch on {entry["text"]!r}: ' \
            f'{[t for t, _ in got]}'
        rows.extend((entry['text'], tok, pos, want)
                    for (tok, pos), want in zip(got, entry['pos']))
    return rows


def test_pos_agreement(goldens):
    rows = _tag_all(goldens)
    agree = sum(1 for _, _, pos, want in rows if pos == want)
    total = len(rows)
    mism = [(t, tok, pos, want) for t, tok, pos, want in rows if pos != want]
    print(f'\nPOS agreement: {agree}/{total} = {agree / total:.4f}')
    for text, tok, pos, want in mism[:25]:
        print(f'  {tok!r}: got {pos}, want {want}  ({text!r})')
    assert agree / total >= POS_FLOOR


def test_adj_recall(goldens):
    """The demo's ADJ-replacement dropdown and the CLI cconj pools need the
    adjectives found (reference ``daam/run/demo.py:77``)."""
    rows = _tag_all(goldens)
    gold_adj = [(tok, pos) for _, tok, pos, want in rows if want == 'ADJ']
    found = sum(1 for _, pos in gold_adj if pos == 'ADJ')
    print(f'\nADJ recall: {found}/{len(gold_adj)} = {found / len(gold_adj):.4f}')
    assert found / len(gold_adj) >= ADJ_RECALL_FLOOR


def test_noun_precision(goldens):
    """Words we call NOUN should really be nouns (word heat-map queries are
    noun-driven in the notebooks/evaluator)."""
    rows = _tag_all(goldens)
    called = [(tok, want) for _, tok, pos, want in rows if pos == 'NOUN']
    right = sum(1 for _, want in called if want == 'NOUN')
    print(f'\nNOUN precision: {right}/{len(called)} = {right / len(called):.4f}')
    assert right / len(called) >= NOUN_PRECISION_FLOOR


def test_lemma_inflection_classes():
    """Lemmatizer spot checks over the inflection classes spaCy handles
    (reference lemma filter ``daam/run/generate.py:175-193``)."""
    cases = {
        'dogs': 'dog', 'boxes': 'box', 'dishes': 'dish', 'benches': 'bench',
        'ponies': 'pony', 'glasses': 'glass', 'men': 'man', 'women': 'woman',
        'children': 'child', 'people': 'person', 'knives': 'knife',
        'running': 'run', 'sitting': 'sit', 'riding': 'ride',
        'making': 'make', 'taking': 'take', 'eating': 'eat',
        'filling': 'fill', 'playing': 'play', 'surfing': 'surf',
        'standing': 'stand', 'watering': 'water', 'using': 'use',
        'parked': 'park', 'stopped': 'stop', 'filled': 'fill',
        'grabbed': 'grab', 'baked': 'bake', 'covered': 'cover',
        'passed': 'pass', 'dressed': 'dress',
        'sat': 'sit', 'ran': 'run', 'ate': 'eat', 'flew': 'fly',
        'wore': 'wear', 'is': 'be', 'was': 'be', 'has': 'have',
        'buses': 'bus', 'cat': 'cat', 'grass': 'grass',
    }
    wrong = {w: (lemmatize(w), want) for w, want in cases.items()
             if lemmatize(w) != want}
    assert not wrong, f'lemma mismatches: {wrong}'


def test_pos_tag_is_deterministic():
    assert pos_tag('blue') == 'ADJ'
    assert pos_tag('dog') == 'NOUN'
    assert pos_tag('running') == 'VERB'
    assert pos_tag("'s") == 'PART'
    assert pos_tag('while') == 'SCONJ'
    assert pos_tag('sat') == 'VERB'


def test_gerund_noun_after_determiner():
    """-ing words heading a noun phrase are nouns ('on a swing'), while
    attributive participles before a noun stay VERB ('a running dog') —
    code-review r3 regression."""
    doc = cached_nlp('a child on a swing')
    assert doc[4].text == 'swing' and doc[4].pos_ == 'NOUN'
    doc = cached_nlp('a running dog')
    assert doc[1].pos_ == 'VERB'
    for w in ('pudding', 'dumpling', 'duckling'):
        assert cached_nlp(f'a {w}')[1].pos_ == 'NOUN'


def test_lemma_short_ing_roots_untouched():
    """5-letter -ing roots are not inflections (code-review r3: 'swing' must
    not lemmatize to 'sw')."""
    for w in ('swing', 'bring', 'cling', 'sling', 'thing', 'spring'):
        assert lemmatize(w) == w
    assert lemmatize('swinging') == 'swing'
    assert lemmatize('using') == 'use'


def test_contraction_tokenization():
    """spaCy-style splits: dog's -> dog + 's; isn't -> is + n't."""
    toks = [t.text for t in cached_nlp("the dog's bone isn't here")]
    assert toks == ['the', 'dog', "'s", 'bone', 'is', "n't", 'here']


def test_dependency_attachment(goldens):
    """UAS/LAS against the hand-annotated subset (heads/deps fields).  The
    reference feeds spaCy parses into ``dependency_relations``
    (``daam/heatmap.py:133-141``) and the demo's displaCy panel; this pins
    the fallback parser's agreement with those conventions."""
    uas = las = tot = 0
    worst = []
    for entry in goldens:
        if 'heads' not in entry:
            continue
        doc = cached_nlp(entry['text'])
        assert len(doc) == len(entry['heads']), entry['text']
        for t, h, d in zip(doc, entry['heads'], entry['deps']):
            tot += 1
            ok = t.head.i == h
            uas += ok
            las += ok and t.dep_ == d
            if not (ok and t.dep_ == d):
                worst.append((entry['text'], t.text, t.dep_, t.head.text, d,
                              doc[h].text))
    print(f'\nUAS {uas}/{tot} = {uas / tot:.4f}   '
          f'LAS {las}/{tot} = {las / tot:.4f}')
    for text, tok, dep, head, want_d, want_h in worst[:20]:
        print(f'  {tok!r}: got {dep}->{head}, want {want_d}->{want_h}'
              f'  ({text!r})')
    assert uas / tot >= UAS_FLOOR
    assert las / tot >= LAS_FLOOR


def test_parse_structure_simple_np():
    """spaCy-convention structure (used by dependency_relations, reference
    ``daam/heatmap.py:133-141``): an NP fragment roots at the head noun with
    the bare participle as ``acl``; det/amod/compound attach to the noun-run
    head; the participle governs its object (``dobj``)."""
    doc = cached_nlp('a big red dog chasing a tennis ball')
    # positions: 0:a 1:big 2:red 3:dog 4:chasing 5:a 6:tennis 7:ball
    assert doc[0].dep_ == 'det' and doc[0].head.text == 'dog'
    assert doc[1].dep_ == 'amod' and doc[1].head.text == 'dog'
    assert doc[2].dep_ == 'amod' and doc[2].head.text == 'dog'
    assert doc[3].dep_ == 'ROOT'
    assert doc[4].dep_ == 'acl' and doc[4].head.text == 'dog'
    assert doc[5].dep_ == 'det' and doc[5].head.text == 'ball'
    assert doc[6].dep_ == 'compound' and doc[6].head.text == 'ball'
    assert doc[7].dep_ == 'dobj' and doc[7].head.text == 'chasing'


def test_parse_structure_finite_clause():
    """A finite clause roots at the verb with aux/nsubj/prep/pobj attachments
    (spaCy en_core_web_md conventions)."""
    doc = cached_nlp('a cat is sitting on the mat')
    # positions: 0:a 1:cat 2:is 3:sitting 4:on 5:the 6:mat
    assert doc[3].dep_ == 'ROOT'
    assert doc[1].dep_ == 'nsubj' and doc[1].head.text == 'sitting'
    assert doc[2].dep_ == 'aux' and doc[2].head.text == 'sitting'
    assert doc[4].dep_ == 'prep' and doc[4].head.text == 'sitting'
    assert doc[6].dep_ == 'pobj' and doc[6].head.text == 'on'


def test_parse_is_always_a_tree():
    """Every token must reach ROOT (spaCy's tree invariant; the standard
    walk-to-root idiom must terminate) — code-review r3 found verb-pair
    cycles like "smiling while eating"."""
    cases = [
        'smiling while eating ice cream',
        'eating and running in the park',
        'a little girl smiling while eating ice cream',
        'a dog',
        '',
    ]
    for text in cases:
        doc = cached_nlp(text)
        for tok in doc:
            seen = set()
            t = tok
            while t.dep_ != 'ROOT':
                assert t.i not in seen, f'head cycle in {text!r} at {tok}'
                seen.add(t.i)
                t = t.head


def test_parse_structure_coordination():
    """cc/conj chains (the cconj CLI action and notebook-2 cohyponym pairs
    are built on coordinated NPs)."""
    doc = cached_nlp('a zebra and a giraffe standing in a field')
    # positions: 0:a 1:zebra 2:and 3:a 4:giraffe 5:standing 6:in 7:a 8:field
    assert doc[1].dep_ == 'ROOT'
    assert doc[2].dep_ == 'cc' and doc[2].head.text == 'zebra'
    assert doc[4].dep_ == 'conj' and doc[4].head.text == 'zebra'
    assert doc[5].dep_ == 'acl' and doc[5].head.text == 'giraffe'
