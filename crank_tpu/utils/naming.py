"""Decoded-file naming contract.

Converted dumps are named ``<uid>_org-<orgspkr>_cv-<cvspkr>[_gen]`` (the
``_gen`` suffix is appended by external parallel_wavegan decoding). The
reference parses these stems with chained ``split()`` calls that break when
utterance ids or speaker names contain underscores (e.g. JVS corpus stems);
here the contract lives in one anchored regex shared by every consumer
(rename_decoded, evaluate_mcd, evaluate_mosnet, vocoder_train).
"""

import re
from typing import NamedTuple, Optional

DECODED_STEM_RE = re.compile(
    r"^(?P<uid>.+)_org-(?P<org>.+?)_cv-(?P<cv>.+?)(?P<gen>_gen)?$"
)


class DecodedStem(NamedTuple):
    uid: str       # utterance id, WITHOUT the speaker prefix
    org: str       # original (source) speaker
    cv: str        # conversion target speaker
    gen: bool      # carried a trailing "_gen" marker


def format_decoded_stem(uid, org_spkr, cv_spkr) -> str:
    return f"{uid}_org-{org_spkr}_cv-{cv_spkr}"


def parse_decoded_stem(stem) -> Optional[DecodedStem]:
    """Parse a decoded stem; None when the stem doesn't match the contract."""
    m = DECODED_STEM_RE.match(stem)
    if m is None:
        return None
    return DecodedStem(m.group("uid"), m.group("org"), m.group("cv"),
                       m.group("gen") is not None)
