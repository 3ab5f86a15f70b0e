"""Phonetic encoding for blocking keys (American/NARA Soundex).

Phonetic key blocking is the classic ER blocking strategy for name
attributes (Fellegi-Sunter era onward): rows whose names *sound* alike
land in the same block even when spelled differently (Robert/Rupert ->
R163). No reference counterpart (/root/reference is embedding blocking
only); this feeds ``dedup.key_blocking_pairs`` as a computed key.

The encoder is built from plain string expressions (upper / translate /
regexp_replace with a backreference) rather than Spark's builtin
``F.soundex`` so the EXACT same chain can be replicated in the DuckDB
oracle SQL (DuckDB has no soundex builtin) — cross-engine parity by
construction, and the whole thing stays inside whole-stage codegen.

Algorithm (NARA variant, the one archives/genealogy standardised):
  1. uppercase, strip non-letters.
  2. keep the first letter verbatim; DELETE H and W from the rest
     (consonants separated by H/W code as adjacent — the NARA rule).
  3. code every letter: BFPV->1 CGJKQSXZ->2 DT->3 L->4 MN->5 R->6,
     vowels->0 (vowels separate: a 0 between equal digits breaks the run,
     so D-vowel-D codes twice).
  4. collapse runs of equal digits, drop the first letter's own code
     (collapsing first, so a second letter with the first letter's code
     is absorbed — Pfister -> P236 not P123), drop the 0s, take three
     digits, right-pad with 0.
Known-value checks (NARA published examples) in tests/test_phonetic.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A..Z -> digit code (vowels + H + W + Y -> 0)
_SOUNDEX_FROM = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_SOUNDEX_TO = "01230120022455012623010202"


def soundex_col(name: str | Column) -> Column:
    """American (NARA) Soundex of a string column as a Column expression.

    Empty / all-non-letter input yields NULL (a NULL key never joins, so
    such rows simply form no block — the behaviour key blocking wants).
    """
    col = F.col(name) if isinstance(name, str) else name
    letters = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    first = F.substring(letters, 1, 1)
    # NARA H/W rule: delete H/W after the first letter, then code
    rest = F.regexp_replace(F.substring(letters, 2, 2_000_000), "[HW]", "")
    coded = F.translate(F.concat(first, rest), _SOUNDEX_FROM, _SOUNDEX_TO)
    # collapse runs per digit (no regex backreference: the oracle runs on
    # DuckDB's RE2, which silently lacks \1 — per-digit collapse is
    # equivalent because runs of distinct digits never interact)
    collapsed = coded
    for d in "123456":
        collapsed = F.regexp_replace(collapsed, f"{d}{d}+", d)
    digits = F.regexp_replace(F.substring(collapsed, 2, 2_000_000), "0", "")
    return F.when(
        F.length(letters) > 0,
        F.concat(first, F.rpad(F.substring(digits, 1, 3), 3, "0")),
    ).otherwise(F.lit(None).cast("string"))


def soundex_sql(expr: str) -> str:
    """The SAME chain as ``soundex_col`` in DuckDB SQL, for oracles.

    DuckDB regexp_replace needs the 'g' flag for replace-all (Spark's is
    always global); everything else — including the per-digit run
    collapse, chosen over a backreference exactly so both regex engines
    (Java vs RE2) execute the identical pattern — is shared surface.
    """
    letters = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    first = f"substr({letters}, 1, 1)"
    rest = f"regexp_replace(substr({letters}, 2), '[HW]', '', 'g')"
    coded = f"translate({first} || {rest}, '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    collapsed = coded
    for d in "123456":
        collapsed = f"regexp_replace({collapsed}, '{d}{d}+', '{d}', 'g')"
    digits = f"regexp_replace(substr({collapsed}, 2), '0', '', 'g')"
    return (
        f"case when length({letters}) > 0 then "
        f"{first} || rpad(substr({digits}, 1, 3), 3, '0') else null end"
    )
