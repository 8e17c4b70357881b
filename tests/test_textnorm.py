"""Unicode normalization (textnorm.py): the pinned cross-engine rule
lower → NFC → RE2 whitespace collapse → trim must be byte-identical
between the Arrow/Python kernel and DuckDB — each seam is pinned by
adversarial samples plus a generative fuzz."""

from __future__ import annotations

import unicodedata

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from urlmap_ray.functions.textnorm import normalize_batch

# cases where Python str.lower DIVERGES from utf8proc/DuckDB (final
# sigma, Turkish dotted capital I) — the kernel must use pc.utf8_lower
ADVERSARIAL = [
    "HeLLo WoRld",
    "Istanbul İ I ı",  # dotted capital I
    "straße ẞ",  # sharp s / capital sharp s
    "ΣΊΣΥΦΟΣ",  # all-caps sigma run
    "Café CAFÉ",  # combining acute (NFC must compose)
    "ǅungla",  # titlecase digraph
    "ﬀ ﬁ",  # ff / fi ligatures
    "Å ring Å angstrom",  # ring / angstrom sign
    "  leading\tand\r\ntrailing   ",
    "nbsp stays nbsp",  # NBSP is NOT in the collapse class
    "",
    "   ",
    "a  b\t\tc\r\rd\n\ne",
]


def _duckdb_norm(s: str) -> tuple[str, int, int]:
    con = duckdb.connect()
    return con.execute(
        "SELECT trim(regexp_replace(nfc_normalize(lower(?)),"
        " '[ \t\r\n]+', ' ', 'g'), ' '),"
        " CAST(len(?) AS BIGINT),"
        " CAST(len(trim(regexp_replace(nfc_normalize(lower(?)),"
        " '[ \t\r\n]+', ' ', 'g'), ' ')) AS BIGINT)",
        [s, s, s],
    ).fetchone()


def _kernel(texts: list[str | None]) -> pa.Table:
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return normalize_batch(t)


def test_adversarial_samples_match_duckdb():
    out = _kernel(ADVERSARIAL)
    for i, s in enumerate(ADVERSARIAL):
        want = _duckdb_norm(s)
        got = (
            out.column("text_norm")[i].as_py(),
            out.column("n_chars")[i].as_py(),
            out.column("n_chars_norm")[i].as_py(),
        )
        assert got == want, (s, got, want)


def test_python_lower_would_diverge():
    # documents WHY the kernel uses pc.utf8_lower: str.lower applies
    # final-sigma and dotted-I rules DuckDB does not
    s = "ΣΊΣΥΦΟΣ"
    assert s.lower() != pc.utf8_lower(pa.array([s]))[0].as_py()
    assert (
        pc.utf8_lower(pa.array([s]))[0].as_py()
        == duckdb.connect().execute("SELECT lower(?)", [s]).fetchone()[0]
    )


def test_ascii_fast_path_is_identity_with_slow_path():
    # ASCII rows skip the per-row NFC loop; a mixed batch must treat the
    # ASCII rows exactly as an all-ASCII batch does
    mixed = ["Plain ASCII  Text", "café İ"]
    pure = ["Plain ASCII  Text", "plain again"]
    m = _kernel(mixed).column("text_norm").to_pylist()
    p = _kernel(pure).column("text_norm").to_pylist()
    assert m[0] == p[0] == "plain ascii text"
    assert m[1] == unicodedata.normalize(
        "NFC", pc.utf8_lower(pa.array([mixed[1]]))[0].as_py()
    )


def test_null_text_propagates():
    out = _kernel(["ok", None])
    assert out.column("text_norm").to_pylist() == ["ok", None]
    assert out.column("n_chars").to_pylist() == [2, None]


def _engines_share_repertoire(s: str) -> bool:
    """True when Arrow's and DuckDB's utf8proc builds agree on the
    case/NFC data for every character of ``s``. The two libraries embed
    different Unicode versions (found by this fuzz: U+10570 VITHKUQI
    CAPITAL A gained a lowercase mapping in Unicode 14 — Arrow lowers
    it, DuckDB's older tables don't). The normalize contract is pinned
    on the SHARED repertoire; corpus/oracle text uses only long-stable
    codepoints, so the driver gate never sees the skew."""
    con = duckdb.connect()
    duck = con.execute(
        "SELECT lower(?), nfc_normalize(?)", [s, s]
    ).fetchone()
    arrow_lower = pc.utf8_lower(pa.array([s]))[0].as_py()
    return duck[0] == arrow_lower and duck[1] == unicodedata.normalize("NFC", s)


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "S", "Z", "M")
        ),
        max_size=40,
    )
)
def test_fuzz_matches_duckdb(s):
    assume(_engines_share_repertoire(s))
    got = _kernel([s])
    want = _duckdb_norm(s)
    assert got.column("text_norm")[0].as_py() == want[0]
    assert got.column("n_chars")[0].as_py() == want[1]
    assert got.column("n_chars_norm")[0].as_py() == want[2]
