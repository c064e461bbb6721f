"""CSV sources with the reference's semantics (SURVEY.md §2.A).

Parity targets (citations into /root/reference):
- A1 scan + type inference            csvs_to_sqlite/utils.py:22-55
- A2 separator, A3 quoting, A4 bad-line policy, A5 encoding fallback
- A7 just-strings, A9-A11 path discovery/naming  utils.py:58-90
- A12 URL source                      utils.py:93-136

Spark-first design: the file is read once with ``inferSchema=False``
(everything string — exactly what the pandas C parser sees pre-inference),
then a SINGLE aggregate pass computes per-column castability and we apply
``try_cast`` projections. This reproduces pandas' int64/float64/object
outcome (including "int column with blanks is float64, later downcast to
INTEGER", reference utils.py:279-303) while remaining one distributed scan
+ one narrow projection — no row-at-a-time Python anywhere.
"""

from __future__ import annotations

import codecs
import fnmatch
import logging
import os
import tempfile
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csvs_to_sqlite_spark.functions.cols import qcol

logger = logging.getLogger("csvs_to_sqlite_spark.csv_source")


class LoadCsvError(Exception):
    """Per-file load failure (reference utils.py:18-19); callers isolate it
    per source file (reference cli.py:224-225)."""


def _is_url(value: str) -> bool:
    # reference utils.py:80-81
    return value.lower().startswith(("http://", "https://"))


def _encoding_probe_window(filepath: str) -> int | None:
    """How many bytes _detect_encoding validates by default: None means
    the whole file; an int means a sampled prefix (files over 256 MB,
    overridable via SPARK_GRAFT_ENCODING_PROBE_BYTES; 0 = always full).
    load_csv uses this to decide whether the trigger probe must finish
    the UTF-8 validation past the sampled window (VERDICT_r09 #6: a
    latin-1 byte past the prefix must flip the whole scan to latin-1
    like the reference's whole-file pandas retry, never silently decode
    to U+FFFD)."""
    env = os.environ.get("SPARK_GRAFT_ENCODING_PROBE_BYTES")
    if env is not None:
        return int(env) or None  # 0 = full validation
    cap = 256 << 20
    try:
        size = os.path.getsize(filepath)
    except OSError:
        size = 0
    return cap if size > cap else None


def _detect_encoding(
    filepath: str,
    encodings_to_try=("utf-8", "latin-1"),
    probe_bytes: int | None = None,
) -> str:
    """Reference utils.py:36-49 retries the whole pandas parse per encoding.

    We instead validate the byte stream incrementally on the driver
    (chunked, constant memory). ``probe_bytes`` caps how much of the file
    is validated: files up to 256 MB get the faithful full check; larger
    files AUTO-SAMPLE a 256 MB prefix (logged) and the trigger probe —
    which streams every byte anyway — finishes the UTF-8 validation for
    the rest (see _scan_rewrite_triggers validate_utf8 / load_csv).
    Override with SPARK_GRAFT_ENCODING_PROBE_BYTES (0 = validate
    everything here).
    """
    if probe_bytes is None:
        probe_bytes = _encoding_probe_window(filepath)
        if probe_bytes is not None:
            logger.warning(
                "encoding probe: sampling first %d bytes of %s (the "
                "trigger probe validates the rest; set "
                "SPARK_GRAFT_ENCODING_PROBE_BYTES=0 to validate all here)",
                probe_bytes,
                filepath,
            )
    last_err: Exception | None = None
    for enc in encodings_to_try:
        decoder = codecs.getincrementaldecoder(enc)()
        try:
            remaining = probe_bytes
            with open(filepath, "rb") as f:
                while True:
                    take = 1 << 20 if remaining is None else min(1 << 20, remaining)
                    chunk = f.read(take) if take else b""
                    if not chunk:
                        # only finalize on true EOF; a sampled prefix may
                        # end mid-codepoint, which is not evidence of a
                        # bad encoding
                        if remaining is None or remaining > 0:
                            decoder.decode(b"", final=True)
                        break
                    decoder.decode(chunk)
                    if remaining is not None:
                        remaining -= len(chunk)
                        if remaining <= 0:
                            break
            return enc
        except (UnicodeDecodeError, ValueError) as e:
            last_err = e
            continue
    raise LoadCsvError(str(last_err))


# Mirrors pandas csv.QUOTE_* read-relevant behavior (reference cli.py:28-33).
_QUOTE_NONNUMERIC = 2
_QUOTE_NONE = 3
_EXTRA = "__extra_fields__"


def _pandas_header_names(fields: list[str]) -> list[str]:
    """pandas' C-parser header naming: empty cells become 'Unnamed: N';
    a duplicate gets the smallest 'name.k' (k counting up per base name)
    that collides with NEITHER the whole original header (lookahead:
    ['a', 'a', 'a.1'] → ['a', 'a.2', 'a.1']) nor an already-assigned
    name. Unit-tested cell-for-cell against pandas.read_csv."""
    base = [
        f"Unnamed: {i}" if (c is None or c == "") else c
        for i, c in enumerate(fields)
    ]
    taken = set(base)
    next_k: dict[str, int] = {}
    seen: set[str] = set()
    out: list[str] = []
    for col in base:
        if col not in seen:
            out.append(col)
            seen.add(col)
            continue
        k = next_k.get(col, 1)
        while f"{col}.{k}" in taken:
            k += 1
        cand = f"{col}.{k}"
        next_k[col] = k + 1
        taken.add(cand)
        seen.add(cand)
        out.append(cand)
    return out


def _read_header(
    local_path: str,
    separator: str,
    quoting: int,
    encoding: str,
    sentinel_restore: dict[str, str] | None = None,
) -> tuple[list[str], int]:
    """(header fields mangled pandas-style, n_index) via the csv module
    (same dialect the data read uses). ``n_index`` is pandas' implicit-
    index inference: when the FIRST data row is k fields WIDER than the
    header, the C parser treats the first k fields of every row as a
    (multi-)index — which to_sql(index=False) then drops, so the data
    shifts left and later rows wider than header+k are the actual bad
    lines (probed: 'a,b\\n1,2,3\\n' → index 1, a=2, b=3; a LATER wide row
    errors). Single-char separators only — load_csv dispatches multi-char
    ones to _load_python_engine before calling this. Runs on the ORIGINAL
    file: the csv module parses quoted newlines and counts trailing
    empties natively, so no rewrite sentinels ever reach header names.
    EXCEPT when the lone-'\\r' pass swallowed a separator (the swallow
    changes what pandas' inference sees): load_csv then re-reads the
    REWRITTEN file with ``sentinel_restore`` set to the per-file
    sentinel assignment, which undoes the rewrite sentinels on the
    header fields (same mapping as the scan projection) before the
    pandas-style name mangling."""
    import csv as _csv

    py_enc = {"ISO-8859-1": "latin-1"}.get(encoding, "utf-8-sig")
    with open(local_path, newline="", encoding=py_enc) as f:
        r = _csv.reader(
            f,
            delimiter=separator,
            quoting=_csv.QUOTE_NONE if quoting == _QUOTE_NONE else _csv.QUOTE_MINIMAL,
        )
        def _blankish(row):
            # pandas skip_blank_lines: empty lines AND space/tab-only
            # lines (probed class — formfeed/vtab lines are data) are
            # skipped. The rewrite pass normally strips ws-lines before
            # this probe runs; the guard keeps the probe faithful even
            # when it sees an un-rewritten file.
            return row == [] or (
                len(row) == 1 and row[0] != "" and row[0].strip(" \t") == ""
            )

        first = next(r, None)
        # pandas skip_blank_lines=True: blank LINES before the header are
        # skipped, the first non-blank row is the header (review finding:
        # rejecting them regressed vs the reference)
        while first is not None and _blankish(first):
            first = next(r, None)
        if not first:
            raise LoadCsvError("No columns to parse from file")
        # first non-blank DATA row decides the implicit-index width
        data = next(r, None)
        while data is not None and _blankish(data):
            data = next(r, None)
    n_index = max(0, len(data) - len(first)) if data else 0
    if sentinel_restore:
        s = sentinel_restore
        restored = []
        for j, f_ in enumerate(first):
            if j == 0 and f_.startswith(s["protect"]):
                f_ = f_[len(s["protect"]):]
            for orig, key in (("\r\n", "crlf"), ("\r", "cr"), ("\n", "lf")):
                f_ = f_.replace(s[key], orig)
            restored.append(f_.replace(s["empty"], ""))
        first = restored
    # pandas' C tokenizer truncates every cell at the first NUL byte
    # (probed: header 'a\x00c' names the column 'a'); tokenization
    # itself is unaffected, so widths stay pre-truncation
    first = [f_.split("\x00", 1)[0] for f_ in first]
    return _pandas_header_names(first), n_index

# pandas read_csv's default na_values (keep_default_na=True): all of these
# become NaN → SQL NULL. Spark's reader only nulls the empty string, so we
# map the rest explicitly after the all-string read.
_PANDAS_NA_TOKENS = (
    # '' is a first-class NA token: load_csv reads with a NUL nullValue
    # sentinel so QUOTED empty fields ("") survive as '' strings — the
    # uint64-conflict rawtext path keeps them literal like pandas, and
    # every other column masks them to NULL here. (Unquoted empty fields
    # are nulled inside Spark's univocity tokenizer before any option
    # applies; since r9 the empty-field sentinel rewrite makes them COUNT like
    # pandas fields — trailing empties reach the bad-line bar, and on
    # uint64-candidate files a mid-row '' survives into rawtext columns.)
    "",
    "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
    "n/a", "nan", "null",
)

# In-quote newline sentinels (A1, reference: pandas' C parser consumes
# quoted fields across physical lines, utils.py:38-47 default read path).
# Spark's line-based scan splits records at EVERY newline; its multiLine
# mode parses quoted newlines but NORMALIZES \r\n -> \n inside quotes
# (probed — diverges from pandas, which keeps the bytes) and reads the
# file as one unsplittable partition. Instead, affected files get a
# driver-side rewrite: each in-quote newline becomes a one-byte control
# sentinel (probed to survive univocity's quoted-field path — NUL does
# NOT), the scan stays line-based and SPLITTABLE, and the scan
# projection restores the original bytes. Order matters: \r\n must be
# replaced before \r / \n. The DEFAULT byte assignment is
# _SENT_DEFAULTS below (crlf \x01, cr \x03, lf \x02, empty-field \x05,
# line-protect \x7f — the protect byte is the one sentinel that must be
# > 0x20, so Spark's trim-empty line drop keeps the protected line);
# _choose_sentinels picks different (file-absent) bytes whenever a
# default actually occurs in a file being rewritten, so genuine control
# bytes survive the restore (VERDICT_r09 #4 closed the old
# fixed-sentinel corruption class).
def _nl_pairs(sentinels: dict[str, str]) -> tuple[tuple[str, str], ...]:
    """(original, sentinel) pairs for the in-quote newline rewrite, in
    replacement order (\\r\\n before its constituent bytes)."""
    return (
        ("\r\n", sentinels["crlf"]),
        ("\r", sentinels["cr"]),
        ("\n", sentinels["lf"]),
    )


def _restore_newlines_col(col, sentinels: dict[str, str]):
    """Undo the newline sentinels on a scan column (no-op on clean
    files). ``sentinels`` is the per-file assignment from
    _rewrite_file."""
    for orig, sent in _nl_pairs(sentinels):
        col = F.replace(col, F.lit(sent), F.lit(orig))
    return col


def _strip_line_class(separator: str) -> str:
    """pandas' blank-line skip class, probed on pandas 2.x: a line that
    tokenizes to ONE field of only space/tab is skipped ANYWHERE in the
    file (including before the header). A separator character never
    counts (a ' \\t ' line under sep='\\t' is two kept fields; a pure
    '\\t' line there is a kept [NaN, NaN] row)."""
    return "".join(sorted({" ", "\t"} - set(separator)))


# any line made only of these is INVISIBLE to Spark's scan (<= 0x20,
# minus the \r/\n line terminators themselves)
_BLANKISH = bytes(b for b in range(0x21) if b not in (0x0A, 0x0D))

# control bytes Spark's toDouble trims but pandas' number parsers REJECT
# (pandas skips only C isspace: \t \n \v \f \r and space) — a numeric
# cell carrying one of these must stay TEXT (probed: '1\x01' is object
# in pandas, 1.0 to Spark's cast). The per-cell guard costs ~2 s per
# sf0.1 inference pass, so load_csv enables it ONLY when the trigger
# probe's byte-presence set shows such a byte exists in the file — clean
# files pay nothing (the r10 structure-fuzz soak found this class).
_NONSPACE_CTRL = "".join(chr(b) for b in range(0x21) if b not in
                         (0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20))
_NONSPACE_CTRL_BYTES = frozenset(ord(c) for c in _NONSPACE_CTRL)

# The empty-field sentinel ('empty' key): univocity nulls an UNQUOTED
# empty field inside the tokenizer, before any reader option applies —
# so Spark cannot see an absent trailing field ('1,2' in a 3-col file →
# NULL) apart from an empty one ('1,2,' → pandas: a third '' field that
# COUNTS toward the bad-line bar and stays a literal '' in no-NA-mask
# object columns). The rewrite inserts the byte into empty unquoted
# fields so they tokenize as fields; the scan projection deletes it
# again (a cell that was '' becomes '' once more, but now it was
# COUNTED). The line-protect sentinel ('protect' key): Spark's CSV
# reader DROPS any physical line whose characters are all <= 0x20
# (String.trim-empty — probed: \x0b, \x0c, \x1c, \x04... lines all
# vanish) while pandas keeps every such line as a data row unless it is
# a single field of only space/tab — kept lines get the prefix, and the
# scan projection strips it from the first field.

# keys of a sentinel assignment, the default bytes, and the candidate
# pools _choose_sentinels draws from when a default occurs in the file.
# Control-pool bytes sit below 0x20 (excluding NUL — univocity strips it
# inside quoted fields — tab/space — whitespace semantics — and the
# \r/\n terminators); the protect byte must be > 0x20 so Spark's
# trim-empty line drop keeps the protected line.
_SENT_KEYS = ("crlf", "cr", "lf", "empty", "protect")
_SENT_DEFAULTS = ("\x01", "\x03", "\x02", "\x05", "\x7f")
_CTRL_POOL = tuple(
    chr(c) for c in (*range(1, 9), 0x0B, 0x0C, *range(0x0E, 0x20))
)
_PROTECT_POOL = tuple(
    chr(c)
    for c in (0x7F, 0x60, 0x7E, 0x5E, 0x40, 0x23, 0x24, 0x25, 0x26, 0x2A,
              0x3B, 0x3F, 0x21, 0x7C, 0x5C, 0x5D, 0x5B, 0x7B, 0x7D)
)


def _ngram_present(local_path: str, k: int):
    """Boolean bitmap over all 256**k byte k-grams: which ones occur in
    the file. One streaming pass, numpy-vectorized; k<=3 keeps the
    bitmap <=16 MiB. Only runs for the (rare) sentinel-pool-exhaustion
    fallback below."""
    import numpy as np

    seen = np.zeros(256**k, dtype=bool)
    carry = b""
    with open(local_path, "rb") as f:
        while True:
            chunk = f.read(1 << 22)
            if not chunk:
                break
            buf = carry + chunk
            a = np.frombuffer(buf, dtype=np.uint8)
            n = len(a) - k + 1
            if n > 0:
                idx = a[:n].astype(np.int64)
                for j in range(1, k):
                    idx = idx * 256 + a[j : n + j]
                seen[idx] = True
            carry = buf[-(k - 1) :] if k > 1 else b""
    return seen


def _multibyte_sentinels(
    local_path: str, separator: str
) -> dict[str, str]:
    """Pool-exhaustion fallback (VERDICT_r10 #2): when a rewrite-needing
    file contains every single-byte sentinel candidate, pick MULTI-byte
    sentinels — five equal-length strings sharing one lead char E, with
    every non-lead char != E, each absent from the file as a byte
    substring. The shared-lead/no-E-tail shape makes false matches
    impossible in the rewritten text: a match must start at an E, a
    genuine E is never followed by the (file-absent) tail, and an
    inserted sentinel's own chars can never line up as a different
    sentinel (position >=1 is never E). Candidate chars are ASCII
    (<0x80), so byte absence == char absence in both utf-8 and latin-1.
    The protect sentinel keeps >=1 char > 0x20 so Spark's trim-empty
    line drop still keeps protected lines. Raises LoadCsvError (loud,
    per-file isolated) if even no 3-byte assignment exists — a crafted
    file containing all ~40k candidate 3-grams; silent byte alteration
    is never possible."""
    base_taken = {separator, '"', "\x00", "\t", " ", "\r", "\n"}
    pool = [
        c for c in _CTRL_POOL + _PROTECT_POOL if c not in base_taken
    ]
    # helpers: a candidate can serve the protect slot iff it carries a
    # char > 0x20 (Spark's trim-empty line drop must keep the line)
    def _protectable(s: str) -> bool:
        return any(ord(ch) > 0x20 for ch in s)

    for k in (2, 3):
        seen = _ngram_present(local_path, k)
        for lead in pool:
            tails = [c for c in pool if c != lead]
            others: list[str] = []
            protect: str | None = None
            if k == 2:
                combos = ((t,) for t in tails)
            else:
                import itertools

                combos = itertools.product(tails, repeat=2)
            # collect the protect slot and the four others SEPARATELY —
            # a flat early-capped list can fill with all-ctrl grams
            # before any >0x20 tail is reached, spuriously refusing a
            # file that has a valid assignment (r11 review finding #4)
            for tail in combos:
                s = lead + "".join(tail)
                code = 0
                for ch in s:
                    code = code * 256 + ord(ch)
                if seen[code]:
                    continue
                if protect is None and _protectable(s):
                    protect = s
                elif len(others) < 4:
                    others.append(s)
                if protect is not None and len(others) >= 4:
                    break
            if protect is None or len(others) < 4:
                continue
            logger.info(
                "sentinel pool exhausted — using %d-byte sentinels "
                "absent from the file",
                k,
            )
            return {
                "crlf": others[0],
                "cr": others[1],
                "lf": others[2],
                "empty": others[3],
                "protect": protect,
            }
    raise LoadCsvError(
        "cannot choose rewrite sentinels: file contains every candidate "
        "byte sequence up to 3 bytes"
    )


def _choose_sentinels(
    present: frozenset[int] | None, separator: str,
    local_path: str | None = None,
) -> dict[str, str]:
    """Per-file sentinel assignment (VERDICT_r09 #4): if any DEFAULT
    sentinel byte genuinely occurs in a file about to be rewritten, pick
    replacement bytes that are ABSENT from the file. ``present`` is the
    byte-presence set the trigger probe accumulates while it streams the
    file anyway (for the ASCII pool bytes, byte presence == character
    presence in both UTF-8 and latin-1 — a <0x80 byte never occurs
    inside a multi-byte UTF-8 sequence). A file containing every pool
    byte falls back to equal-length MULTI-byte sentinels proven absent
    from the file (_multibyte_sentinels; VERDICT_r10 #2) — no input is
    ever silently altered."""
    chosen = dict(zip(_SENT_KEYS, _SENT_DEFAULTS))
    if present is None or not any(ord(d) in present for d in _SENT_DEFAULTS):
        return chosen
    taken = {separator, '"', "\x00", "\t", " ", "\r", "\n"}
    for key in _SENT_KEYS:
        d = chosen[key]
        if d not in taken and ord(d) not in present:
            taken.add(d)
            continue
        pool = _PROTECT_POOL if key == "protect" else _CTRL_POOL
        for c in pool:
            if c not in taken and ord(c) not in present:
                chosen[key] = c
                taken.add(c)
                break
        else:
            if local_path is not None:
                # VERDICT_r10 #2: no single absent byte left — switch
                # the WHOLE assignment to equal-length multi-byte
                # sentinels proven absent from the file (loud
                # LoadCsvError if even that fails; never silent
                # alteration of genuine bytes)
                return _multibyte_sentinels(local_path, separator)
            logger.warning(
                "sentinel pool exhausted for %r — file uses every "
                "candidate byte; genuine %r bytes may be altered by the "
                "restore projection",
                key,
                d,
            )
            taken.add(d)
    return chosen


def _scan_rewrite_triggers(
    local_path: str,
    separator: str,
    quoting: int,
    width: int,
    validate_utf8: bool = False,
) -> tuple[bool, bool, bool, bool, bool, int | None, frozenset[int]]:
    """One chunked driver-side pass over the raw bytes deciding whether
    the file needs the pre-scan rewrite (single-char separators only —
    multi-char routes to _load_python_engine). Returns (quoted_newlines,
    blankish_lines, trailing_empty, uint64_empties, lone_cr_adjacency,
    eof_open_row — non-None means pandas refuses the file with 'EOF
    inside string starting at row N' and load_csv must raise the same
    LoadCsvError — and byte_presence, the set of byte values occurring
    in the file, from which _choose_sentinels picks collision-free
    sentinel bytes):

    - lone_cr_adjacency: a '\\r' NOT followed by '\\n' is immediately
      followed by the separator or by space/tab. pandas' C tokenizer
      treats these adjacencies specially (delimiter swallowed after a
      skipped line) or CORRUPTS its buffer on them (see _lone_cr_pass) —
      the rewrite resolves each with exact quote context. In-quote
      occurrences over-flag here (the rewrite sees them sealed and does
      nothing).

    - quoted_newlines, three tiers, all vectorized on the hot path:
      (1) quotes are CLASSIFIED (numpy gathers of each quote's
      neighbors): opener (prev is sep/newline), closer (next is
      sep/newline/EOF) or doubled. (2) If every quote classifies, naive
      quote parity at newlines is EXACT — openers/closers pair up and
      doubles are even, so an odd count at a newline is precisely an
      open field (proof: a still-open field contributes its opener plus
      doubles = odd; everything closed = even). A parity hit over-flags
      at worst (a rule-closer the tokenizer treats as literal), and the
      rewrite's field-start-anchored regex is the authority anyway.
      (3) Only files with an UNCLASSIFIABLE quote (a stray mid-field
      inch-mark — the r9 review finding), a >=3 quote run (an odd run
      can hide an opener at even total count) or an odd total quote
      count fall back to _exact_quote_scan. A pure-Python per-quote walk on
      the hot path was tried first and cost 24 s on a 47 MB QUOTE_ALL
      export — the tiers keep that file fully vectorized.
    - blankish_lines: a physical line of only <=0x20 bytes exists —
      pandas either skips it (space/tab only) or keeps it as a data row;
      Spark's scan does neither consistently, so the rewrite resolves
      each. Chunk boundaries can over-flag, never under-flag.
    - trailing_empty: set only when in-quote newlines make per-line
      field counts unreliable — then ANY trailing separator gets the
      (cheap) trailing-only sentinel, since the file is being rewritten
      for the quotes anyway.
    - validate_utf8 (files whose encoding probe sampled a prefix): the
      probe already streams every byte, so the UTF-8 validation of the
      un-sampled tail rides along here for free — an invalid byte raises
      UnicodeDecodeError and load_csv flips the whole scan to latin-1,
      exactly what the reference's whole-file pandas retry does
      (utils.py:36-49). Closes the silent-U+FFFD class (VERDICT_r09 #6).
    - need_empties (the all-empties sentinel rewrite) fires when EITHER
      (a) some line exceeds ``width`` fields by the vectorized sep
      count — a pandas BAD LINE even when the overflow fields are empty
      (univocity nulls them invisibly; quoted separators over-count →
      over-flag only, univocity's own counting stays the authority), or
      (b) an empty field coexists with a 19+-digit run (a uint64-tier
      literal), where the no-NA-mask rawtext quirk makes '' cells
      visible. A file whose EVERY line ends with a sep has the empty
      field INSIDE the header width and needs no rewrite at all.
    """
    import re as _re

    import numpy as np

    blank_body = _re.compile(rb"[" + _re.escape(_BLANKISH) + rb"]+")
    sep_byte = separator.encode()[0]
    check_quotes = quoting != _QUOTE_NONE
    blank_flag = simple_trail = overwide = empty_flag = cr_flag = False
    parity_hit = suspicious = run3 = False
    carry = 0  # quote-count parity across chunks
    sep_carry = 0  # separators on the current (chunk-spanning) line
    # two carried bytes: index 1 is the previous chunk's FINAL byte,
    # whose quote classification needs both neighbors (deferred to here);
    # index 0 exists so that byte's own predecessor is available
    prev2 = b"\n\n"  # virtual newlines before file start (BOF = BOL)
    eof_tail = b""
    seen = np.zeros(256, dtype=bool)
    utf8_dec = (
        codecs.getincrementaldecoder("utf-8")() if validate_utf8 else None
    )
    with open(local_path, "rb") as f:
        while True:
            chunk = f.read(1 << 22)
            if not chunk:
                if utf8_dec is not None:
                    utf8_dec.decode(b"", final=True)
                break
            if utf8_dec is not None:
                # raises UnicodeDecodeError -> load_csv retries latin-1
                utf8_dec.decode(chunk)
            buf = prev2 + chunk
            a = np.frombuffer(buf, dtype=np.uint8)
            # presence from the chunk bytes only (a[2:] == chunk):
            # prev2 starts as VIRTUAL b'\n\n', which would mark 0x0A
            # present even for newline-free files (ADVICE_r10)
            seen |= np.bincount(a[2:], minlength=256).astype(bool)
            is_nl = (a == 10) | (a == 13)
            nl_all = is_nl.nonzero()[0]
            if not cr_flag and b"\r" in buf:
                # lone '\r' (no '\n' after) adjacent to sep/space/tab —
                # indices >=1 so every byte pairs with its successor
                # exactly once across chunks (prev2 carries the tail).
                # Gated on a memchr so \n-only files pay nothing.
                nxt = a[2:]
                cr = a[1:-1] == 13
                if bool(
                    (
                        cr
                        & (nxt != 10)
                        & ((nxt == sep_byte) | (nxt == 32) | (nxt == 9))
                    ).any()
                ):
                    cr_flag = True
            if not blank_flag and nl_all.size:
                # byte AFTER a newline is blank-ish -> verify that line
                after = nl_all + 1
                after = after[after < len(buf)]
                cand = after[(a[after] <= 0x20) & ~is_nl[after]]
                for pos in cand[:64]:
                    end = blank_body.match(buf, int(pos)).end()
                    if end >= len(buf) or buf[end] in (10, 13):
                        blank_flag = True
                        break
                else:
                    if cand.size > 64:
                        blank_flag = True  # over-flag; rewrite re-checks
            # this chunk's OWN bytes start at index 2
            nl_pos = nl_all[nl_all > 1]
            s_pos = (a == sep_byte).nonzero()[0]
            s_pos = s_pos[s_pos > 1]
            if nl_pos.size:
                if not simple_trail and bool(
                    (a[nl_pos - 1] == sep_byte).any()
                ):
                    simple_trail = True
                if not empty_flag:
                    # an empty field exists where a sep is adjacent to
                    # BOL/sep (trailing covered by simple_trail)
                    is_sep = a == sep_byte
                    if bool(
                        (is_sep[:-1] & is_sep[1:]).any()
                        or (is_nl[:-1] & is_sep[1:]).any()
                    ):
                        empty_flag = True
                if not overwide:
                    cnt_before = np.searchsorted(s_pos, nl_pos)
                    line_seps = np.diff(np.concatenate(([0], cnt_before)))
                    if line_seps.size:
                        line_seps[0] += sep_carry
                    if bool((line_seps + 1 > width).any()):
                        # a line with more fields than header+index: a
                        # pandas BAD LINE even when the overflow fields
                        # are EMPTY (univocity nulls those invisibly, so
                        # the rewrite must sentinel every empty field to
                        # keep the _EXTRA bad-line counting exact).
                        # Quoted separators over-count -> over-flag only
                        # (univocity still counts the real fields).
                        overwide = True
                    sep_carry = int(s_pos.size - cnt_before[-1])
                else:
                    sep_carry = int(
                        s_pos.size - np.searchsorted(s_pos, nl_pos[-1])
                    )
            else:
                is_sep = a == sep_byte
                if not empty_flag and bool(
                    (is_sep[:-1] & is_sep[1:]).any()
                    # a line-leading empty field whose newline is the
                    # PREVIOUS chunk's last byte (prev2-prefixed here)
                    or (is_nl[:-1] & is_sep[1:]).any()
                ):
                    empty_flag = True
                sep_carry += int(s_pos.size)
            if check_quotes and not parity_hit:
                if b'"' not in buf:
                    if carry and nl_pos.size:
                        parity_hit = True
                else:
                    q_all = (a == 34).nonzero()[0]
                    q_own = q_all[q_all > 1]
                    if not run3 and q_all.size >= 3:
                        # a run of >=3 quotes can hide an opener while
                        # keeping totals even ('"""' = open+escape) —
                        # the parity proof needs runs of length <= 2
                        d = np.diff(q_all)
                        if bool(((d[:-1] == 1) & (d[1:] == 1)).any()):
                            run3 = True
                    if not suspicious:
                        # classify every quote whose BOTH neighbors are
                        # in view (position 1 = prev chunk's final byte;
                        # the current final byte defers to next chunk or
                        # the EOF rule below)
                        cls = q_all[(q_all >= 1) & (q_all < len(buf) - 1)]
                        if cls.size:
                            prevs = a[cls - 1]
                            nxts = a[cls + 1]
                            ok = (
                                (prevs == sep_byte)
                                | (prevs == 10)
                                | (prevs == 13)
                                | (prevs == 34)
                                | (nxts == sep_byte)
                                | (nxts == 10)
                                | (nxts == 13)
                                | (nxts == 34)
                            )
                            if not bool(ok.all()):
                                suspicious = True
                    if nl_pos.size and bool(
                        (
                            (np.searchsorted(q_own, nl_pos) + carry) & 1
                        ).any()
                    ):
                        parity_hit = True
                    carry = (carry + int(q_own.size)) & 1
            prev2 = buf[-2:]
            eof_tail = (eof_tail + chunk)[-1:]
    if eof_tail and eof_tail[0] == sep_byte:
        simple_trail = True
    if sep_carry + 1 > width:
        overwide = True  # unterminated final line, too many fields
    eof_open_row = None
    if check_quotes and (suspicious or run3 or (carry & 1)):
        # the vectorized tiers cannot prove this file clean: a stray
        # mid-field quote or an odd total quote count — run the exact
        # tokenizer-model scan, which also detects pandas' EOF-inside-
        # string refusal (an unterminated quoted field)
        q_flag, eof_open_row = _exact_quote_scan(local_path, sep_byte)
    else:
        # non-suspicious + even quote count: parity at newlines is exact
        # and the final state is provably closed
        q_flag = parity_hit
    need_empties = overwide
    if not need_empties and (empty_flag or simple_trail):
        # rawtext '' visibility needs the sentinel only when a
        # uint64-tier literal can exist
        need_empties = _has_19_digit_run(local_path)
    # with in-quote newlines the per-line counts are unreliable: any
    # trailing sep flags the (cheaper) trailing-only sentinel
    trail_flag = q_flag and simple_trail
    present = frozenset(np.flatnonzero(seen).tolist())
    return (
        q_flag, blank_flag, trail_flag, need_empties, cr_flag,
        eof_open_row, present,
    )


def _exact_quote_scan(local_path: str, sep_byte: int):
    """Exact pandas-C-tokenizer quote scan for files the vectorized tiers
    cannot prove clean (a stray mid-field quote, or odd total quote
    count). Walks quote-state EVENTS via C-speed bytes.find/count — a
    quote opens a field only after sep/newline/BOF, doubled quotes
    escape, everything else is literal. Returns (in_quote_newline_seen,
    eof_open_row): eof_open_row is the pandas row index (newlines
    OUTSIDE quotes before the opener — blank lines count, quoted
    newlines don't) of a field still open at EOF, i.e. pandas' 'EOF
    inside string starting at row N' refusal; None when every field
    closes. Rare path, CHUNKED since round 10 (constant driver memory —
    one byte held back per chunk so a '\"\"' escape pair or a '\\r\\n'
    pair never splits an examined position)."""
    has_nl = False
    row = 0
    in_quote = False
    open_row = None
    prev_last = b"\n"  # BOF = BOL
    pending_cr = False  # processed region ended with an out-of-quote \r
    carry = b""
    with open(local_path, "rb") as f:
        while True:
            chunk = f.read(1 << 22)
            at_eof = not chunk
            data = carry + chunk
            limit = len(data) if at_eof else len(data) - 1
            i = 0
            while i < limit:
                j = data.find(b'"', i, limit)
                if not in_quote:
                    end = limit if j < 0 else j
                    seg = (
                        data.count(b"\n", i, end)
                        + data.count(b"\r", i, end)
                        - data.count(b"\r\n", i, end)
                    )
                    if i == 0 and pending_cr and data[:1] == b"\n":
                        seg -= 1  # the \n completes an already-counted \r\n
                    row += seg
                    if j < 0:
                        i = limit
                        break
                    pb = data[j - 1] if j > 0 else prev_last[0]
                    if pb == sep_byte or pb == 0x0A or pb == 0x0D:
                        in_quote = True
                        open_row = row
                    i = j + 1
                else:
                    end = limit if j < 0 else j
                    if (
                        data.find(b"\n", i, end) >= 0
                        or data.find(b"\r", i, end) >= 0
                    ):
                        has_nl = True
                    if j < 0:
                        i = limit
                        break
                    if data[j + 1 : j + 2] == b'"':
                        # escaped "" stays inside the field (j+1 may be
                        # the held-back byte — consuming it empties the
                        # carry below)
                        i = j + 2
                    else:
                        in_quote = False
                        i = j + 1
            consumed = max(limit, min(i, len(data)))
            pending_cr = (
                not in_quote and data[consumed - 1 : consumed] == b"\r"
            )
            if consumed:
                prev_last = data[consumed - 1 : consumed]
            carry = data[consumed:]
            if at_eof:
                break
    return has_nl, (open_row if in_quote else None)


def _has_nonspace_ctrl(local_path: str) -> bool:
    """Chunked driver-side check: does the file contain any control byte
    Spark's numeric casts trim but pandas rejects (_NONSPACE_CTRL)? The
    C-engine path gets this from the trigger probe's presence set; the
    python-engine path (multi-char separators, no trigger probe) runs
    this one numpy pass instead."""
    import numpy as np

    with open(local_path, "rb") as f:
        while True:
            chunk = f.read(1 << 22)
            if not chunk:
                return False
            a = np.frombuffer(chunk, dtype=np.uint8)
            if bool(((a < 9) | ((a > 13) & (a < 32))).any()):
                return True


def _has_19_digit_run(local_path: str) -> bool:
    """Deferred second pass (only files that HAVE empty fields pay it):
    does any 19+-digit run exist — the uint64-tier gate for the
    all-empties sentinel rewrite."""
    import numpy as np

    run = 0
    with open(local_path, "rb") as f:
        while True:
            chunk = f.read(1 << 22)
            if not chunk:
                return False
            a = np.frombuffer(chunk, dtype=np.uint8)
            nd = np.flatnonzero((a < 48) | (a > 57))
            if nd.size == 0:
                run += len(chunk)
                if run >= 19:
                    return True
                continue
            head = int(nd[0])
            longest = max(
                run + head,
                len(chunk) - 1 - int(nd[-1]),
                int((np.diff(nd) - 1).max()) if nd.size > 1 else 0,
            )
            if longest >= 19:
                return True
            run = len(chunk) - 1 - int(nd[-1])
    return False



def _lone_cr_pass(text: str, separator: str) -> tuple[str, int]:
    """pandas C-tokenizer semantics for a LONE '\\r' line terminator
    (one not followed by '\\n') adjacent to the separator or to blank
    characters — probed exhaustively on pandas 2.2.2:

    1. When the '\\r' terminates a SKIPPED line (empty, or space/tab-only
       — the skip_blank_lines class) and the next character is the
       separator, pandas SWALLOWS that separator: 'a,b\\n\\r,1\\n' parses
       to the single-field row ['1'] and ' \\r,,\\n' to the two-field row
       ['', '']. Spark's scan has no such state — the rewrite deletes the
       swallowed byte here. A swallow can change the first data row's
       width, so load_csv re-derives the implicit-index inference from
       the rewritten file whenever this pass swallowed anything.
    2. A lone '\\r' followed by space/tab whose run reaches CONTENT
       (not a terminator/EOF) CORRUPTS pandas' tokenizer buffer: probed
       outputs include 262,146 phantom all-NaN rows ('a,b\\n1,2\\n\\r x
       \\n3,4'), 'Buffer overflow caught' refusals ('a,b\\n1,2\\nx,y\\r
       z,w\\n3,4'), refusals with miscounted field bars ('a,b\\n\\r 1,,
       \\x0c\\t' → 'Expected 2 fields in line 4, saw 3') and
       window-dependent phantom rows near the header — the artifacts
       depend on the parse buffer position, not the data. The reference
       cannot meaningfully ingest this class, so we REFUSE loudly
       (LoadCsvError) instead of replicating buffer corruption;
       tools/structure_fuzz.py classifies the signature as a documented
       pandas-bug divergence. Same rule when the blank run follows a
       would-be-swallowed separator ('\\r, 9' — probed: phantom row +
       the separator comes back).
    3. A lone '\\r' + space/tab run that ends at a terminator/EOF is a
       plain whitespace-only line — pandas skips it cleanly (probed),
       and the blank-line strip in _rewrite_file already handles it.

    Runs on SEALED text (in-quote newlines already sentinelized), so
    every '\\r' seen here is a real out-of-quote terminator. Only
    '\\r' positions are visited (C-speed str.find); returns
    (new_text, n_swallowed).
    """
    blanks = {" ", "\t"} - set(separator)
    strip_cls = set(_strip_line_class(separator))
    n = len(text)
    out: list[str] = []
    emitted = 0  # text consumed into out
    swallowed = 0
    deleted_at = -1  # position of the last swallowed separator
    p = text.find("\r")
    while p != -1:
        nxt = text[p + 1 : p + 2]
        if nxt == "\n":
            p = text.find("\r", p + 2)
            continue
        if nxt == separator:
            ls = max(text.rfind("\n", 0, p), text.rfind("\r", 0, p)) + 1
            body = text[ls:p]
            if ls == deleted_at:
                body = body[1:]
            if body == "" or (strip_cls and set(body) <= strip_cls):
                # skipped line: scan the blank run after the separator
                j = p + 2
                while j < n and text[j] in blanks:
                    j += 1
                if j > p + 2 and text[j : j + 1] not in ("", "\r", "\n"):
                    raise LoadCsvError(
                        "Error tokenizing data. C error: lone '\\r' "
                        "followed by whitespace corrupts the pandas "
                        "tokenizer buffer (refusing instead of "
                        "replicating corrupt output)"
                    )
                # swallow the separator
                out.append(text[emitted : p + 1])
                emitted = p + 2
                deleted_at = p + 1
                swallowed += 1
        elif nxt in blanks:
            j = p + 2
            while j < n and text[j] in blanks:
                j += 1
            if text[j : j + 1] not in ("", "\r", "\n"):
                raise LoadCsvError(
                    "Error tokenizing data. C error: lone '\\r' followed "
                    "by whitespace corrupts the pandas tokenizer buffer "
                    "(refusing instead of replicating corrupt output)"
                )
        p = text.find("\r", p + 1)
    if not swallowed:
        return text, 0
    out.append(text[emitted:])
    return "".join(out), swallowed


def _advance_cut_scan(
    buf: str, start: int, in_q: bool, separator: str, check_quotes: bool
) -> tuple[int | None, int, bool]:
    """Resumable scan for safe window cuts: walks ``buf[start:]`` with
    entry quote-state ``in_q`` and returns (latest position just AFTER an
    out-of-quote '\\n' in the walked region or None, resume position,
    exit quote-state). ``buf`` always starts at a line start in
    out-of-quote state, so the pandas open/close walk (open only after
    sep/newline/BOF, doubled quotes escape) is exact. Cutting only after
    '\\n' (never a lone '\\r') keeps every lone-'\\r' successor visible
    to _lone_cr_pass within one processing window.

    Resumability (r10 review finding: re-walking the whole carry per
    8 MiB read made a cut-less GiB-scale quoted field or '\\n'-free line
    run quadratic): the caller threads (resume position, quote-state)
    through reads so each byte is walked once. A final '\"' reached
    while IN a quoted field is NOT consumed (its escaped-pair lookahead
    needs the next chunk's first byte) — the resume position stops just
    before it."""
    n = len(buf)
    if not check_quotes:
        k = buf.rfind("\n", start)
        return (None if k < 0 else k + 1), n, False
    last = -1
    pos = start
    while True:
        j = buf.find('"', pos)
        if not in_q:
            k = buf.rfind("\n", pos, n if j < 0 else j)
            if k >= 0:
                last = k
            if j < 0:
                pos = n
                break
            prev = buf[j - 1] if j > 0 else "\n"  # BOF = BOL
            if prev == separator or prev in "\r\n":
                in_q = True
            pos = j + 1
        else:
            if j < 0:
                pos = n
                break
            if j == n - 1:
                # escaped-pair lookahead would need the next chunk —
                # leave this quote unconsumed for the next resume
                pos = j
                break
            if buf[j + 1] == '"':
                pos = j + 2
            else:
                in_q = False
                pos = j + 1
    return (None if last < 0 else last + 1), pos, in_q


def _rewrite_file(
    local_path: str,
    separator: str,
    encoding: str,
    do_quotes: bool,
    do_blank: bool,
    do_trailing: bool = False,
    do_empties: bool = False,
    do_cr: bool = False,
    sentinels: dict[str, str] | None = None,
    present: frozenset[int] | None = None,
    do_nul: bool = False,
    _window: int = 8 << 20,
) -> tuple[str | None, bool, bool, bool, int, dict[str, str]]:
    """Driver-side pre-scan rewrite for the line classes Spark's
    distributed scan cannot express (pandas handles all of them in its
    C parser):

    1. in-quote newlines -> newline sentinels (restored in the scan
       projection, byte-faithful including \\r\\n inside quotes);
    2. physical lines of only <=0x20 bytes, which Spark's scan silently
       drops: the ones pandas skips (a single field of space/tab only)
       are stripped, every other one (formfeed/vtab/control lines —
       pandas data rows) gets a protect prefix stripped at scan time.
       Runs AFTER 1 so a blank-looking line INSIDE a quoted field
       survives as field content.

    Sentinel bytes are chosen PER FILE from bytes absent in the file
    (_choose_sentinels over ``present``, the trigger probe's byte-
    presence set; defaults = the r9 constants). A second rewrite pass
    (the post-swallow width correction in load_csv) must pass the first
    pass's ``sentinels`` back in so both passes share one assignment.

    STREAMING since round 10 (VERDICT_r09 #3): the file is processed in
    8 MiB windows cut at out-of-quote '\\n' boundaries (exact quote walk,
    _last_closed_newline) and written incrementally, so driver memory is
    bounded by the window plus the longest quoted field / lone-'\\r' line
    run — not the file size. Every pass is line-local: windows start at
    line starts (the patterns' \\A alternative stands in for the
    preceding newline) and end right after '\\n', so no pattern can span
    a window boundary. A window with no provable cut (one giant quoted
    field or a '\\n'-free line run) grows until its newline arrives —
    bounded by that field/run, the same memory pandas needs for the
    field itself.

    A quoted field starts only where the preceding character is a
    separator or newline (or at file start) — same model as the pandas
    tokenizer, which treats a mid-field quote as a literal character.
    Returns (temp path or None if nothing changed, quoted_rewrites_made,
    lines_protected, empties_inserted, separators_swallowed — from the
    lone-'\\r' pass, see _lone_cr_pass — and the sentinel assignment
    used). The temp file is tracked in _DECOMPRESSED_TEMPS
    (engine frees it after the typed spill; atexit backstop otherwise).
    Cost note (SCALE.md): O(file) driver IO at constant memory, paid
    ONLY by affected files — the same files pandas itself can only read
    single-process.
    """
    import contextlib
    import re as _re

    py_enc = "latin-1" if encoding == "ISO-8859-1" else "utf-8"
    if sentinels is None:
        sentinels = _choose_sentinels(present, separator, local_path)
    nl_sentinels = _nl_pairs(sentinels)
    counts = {"quoted": 0, "cr": 0, "empty": 0, "blank": 0, "protect": 0,
              "nul": 0}

    sep_last = _re.escape((separator or ",")[-1])
    field_pat = _re.compile(r'(?<![^' + sep_last + r'\n\r])"[^"]*(?:""[^"]*)*"')

    def _seal(m):
        s = m.group(0)
        if do_nul and "\x00" in s:
            # pandas truncates the field VALUE at the first NUL while the
            # tokenizer keeps scanning to the closing quote (probed) —
            # and univocity SILENTLY DROPS NULs from quoted fields that
            # contain escaped quotes, so the truncation cannot be left to
            # the scan projection. Raw-position truncation is safe: the
            # kept prefix has balanced ""-pairs (a NUL between an escaped
            # pair's two quotes is the malformed-quoting class).
            counts["nul"] += 1
            s = s[: s.index("\x00")] + '"'
        if "\n" in s or "\r" in s:
            counts["quoted"] += 1
            for orig, sent in nl_sentinels:
                s = s.replace(orig, sent)
        return s

    S = _re.escape(separator)
    if do_empties:
        # every empty field adjacent to a separator (incl. mid-row and
        # leading) — the uint64/rawtext-candidate class. pandas'
        # tokenizer COUNTS empty unquoted fields (bad-line bar; literal
        # '' in the no-NA-mask rawtext quirk); univocity nulls them
        # before any option applies. The sentinel makes them tokenize as
        # fields; the scan projection deletes the byte again. Runs after
        # the quote pass, so [\r\n] can no longer occur inside quoted
        # fields, and a sep-adjacent position INSIDE quotes only gains a
        # transient byte the restore strips from the value.
        empty_pats = [
            _re.compile(r"(?<=" + S + r")(?=" + S + r"|\r|\n|\Z)"),
            _re.compile(r"(?:\A|(?<=[\r\n]))(?=" + S + r")"),
        ]
    elif do_trailing:
        # trailing empties only: enough for the bad-line bar. Every sep
        # in a trailing RUN gets one ('3,4,,' -> 2 counted fields, else
        # the nulled middle '' would fill the _EXTRA slot invisibly
        # while the sentinel falls off the schema)
        empty_pats = [
            _re.compile(r"(?<=" + S + r")(?=(?:" + S + r")*(?:[\r\n]|\Z))")
        ]
    else:
        empty_pats = []

    strip_cls = set(_strip_line_class(separator))
    blank_chars = set(_BLANKISH.decode("latin-1"))
    blank_pat = _re.compile(
        r"(?:\A|(?<=[\r\n]))(["
        + _re.escape("".join(sorted(blank_chars)))
        + r"]+)(\r\n|\r|\n|\Z)"
    )

    def _resolve(m):
        body = m.group(1)
        if strip_cls and set(body) <= strip_cls:
            counts["blank"] += 1
            return ""  # pandas skips the whole line, terminator too
        counts["protect"] += 1
        return sentinels["protect"] + body + m.group(2)

    if do_nul:
        # out-of-quote NUL: pandas truncates the value at the NUL but
        # still tokenizes to the true delimiter — delete from the NUL to
        # the field end (runs AFTER the quote pass, which has already
        # truncated every well-formed quoted field, so any remaining NUL
        # is outside quotes). LINE-AWARE: a line containing a NUL is
        # never pandas-blank-skipped (the skip class is space/tab only),
        # but the deletion can leave an empty or all-<=0x20 line that
        # Spark's trim-empty drop would silently remove — those lines
        # get the protect prefix so the row survives and restores to the
        # truncated value (r11 structure-fuzz find, seeds 160811-160813).
        nul_line_pat = _re.compile(
            r"(?:\A|(?<=[\r\n]))([^\r\n]*\x00[^\r\n]*)"
        )
        nul_span = _re.compile("\x00[^" + S + "\r\n]*")
        low_chars = set(_BLANKISH.decode("latin-1"))

        def _nul_resolve(m):
            out, k = nul_span.subn("", m.group(1))
            counts["nul"] += k
            if not out or set(out) <= low_chars:
                counts["protect"] += 1
                out = sentinels["protect"] + out
            return out

    def _process(proc: str) -> str:
        if do_quotes or do_nul:
            proc = field_pat.sub(_seal, proc)
        if do_cr:
            # lone-'\r' adjacency semantics (swallow/refuse — see
            # _lone_cr_pass). Runs after the quote pass so every
            # remaining '\r' is a real out-of-quote terminator, and
            # before the empties pass so a swallowed separator never
            # gains an empty-field sentinel.
            proc, k = _lone_cr_pass(proc, separator)
            counts["cr"] += k
        if do_nul:
            # AFTER the lone-CR pass: pandas' tokenizer sees the raw
            # byte order, so a NUL sitting between a lone '\r' and the
            # separator BLOCKS the swallow ('\r\x00,' is an ordinary
            # line break + a truncated field, not a swallow) — deleting
            # the NUL first would fabricate adjacency pandas never saw
            # (r11 review finding, diff-locked crnulblock scenarios)
            proc = nul_line_pat.sub(_nul_resolve, proc)
        for pat in empty_pats:
            proc, k = pat.subn(sentinels["empty"], proc)
            counts["empty"] += k
        if do_blank:
            proc = blank_pat.sub(_resolve, proc)
        return proc

    window = _window
    fd, plain = tempfile.mkstemp(suffix=".csv")
    try:
        with open(local_path, encoding=py_enc, newline="") as src, os.fdopen(
            fd, "w", encoding=py_enc, newline=""
        ) as out:
            carry = ""
            scan_pos = 0  # how far the cut scan has walked into carry
            scan_in_q = False
            while True:
                chunk = src.read(window)
                if not chunk:
                    if carry:
                        out.write(_process(carry))
                    break
                buf = carry + chunk
                cut, scan_pos, scan_in_q = _advance_cut_scan(
                    buf, scan_pos, scan_in_q, separator, do_quotes
                )
                if cut is None:
                    carry = buf  # grows at most to one field/line run
                    continue
                out.write(_process(buf[:cut]))
                carry = buf[cut:]
                scan_pos -= cut
    except Exception:
        with contextlib.suppress(OSError):
            os.unlink(plain)
        raise
    if not any(counts.values()):
        os.unlink(plain)
        return None, False, False, False, 0, sentinels
    _DECOMPRESSED_TEMPS.append(plain)
    return (
        plain,
        bool(counts["quoted"]),
        bool(counts["protect"]),
        bool(counts["empty"]),
        counts["cr"],
        sentinels,
    )


# full-size plaintext copies of compressed inputs; the engine releases
# them once the typed spill has landed (standalone load_csv callers are
# covered by the atexit backstop)
_DECOMPRESSED_TEMPS: list[str] = []


def cleanup_decompressed_temps() -> None:
    """Delete the decompressed temp copies of compressed CSV inputs.
    Safe to call any time no live Spark plan still scans them (the
    engine calls it after spilling each source to typed parquet)."""
    import contextlib

    while _DECOMPRESSED_TEMPS:
        with contextlib.suppress(OSError):
            os.unlink(_DECOMPRESSED_TEMPS.pop())


import atexit

atexit.register(cleanup_decompressed_temps)


def load_csv(
    spark: SparkSession,
    filepath: str,
    separator: str = ",",
    skip_errors: bool = False,
    quoting: int = 0,
    shape: str | None = None,
    just_strings: bool = False,
    float_parity: bool | None = None,
    _with_counts: bool = False,
) -> DataFrame:
    """A1-A8: one CSV file → typed DataFrame (reference utils.py:22-55).

    With ``_with_counts`` (engine fast path) returns
    ``(df, {partition_id: rows})`` — the counts come from the SAME
    aggregate pass as type inference, so row-id assignment needs no second
    scan."""
    from csvs_to_sqlite_spark.operators.shapes import parse_shape

    local_path = filepath
    if _is_url(filepath):
        # A12 (reference utils.py:93-136): fetch to a driver-local temp file.
        try:
            fd, local_path = tempfile.mkstemp(suffix=".csv")
            with urllib.request.urlopen(filepath) as resp, os.fdopen(fd, "wb") as out:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
        except Exception as e:
            raise LoadCsvError(str(e)) from e

    if not os.path.exists(local_path):
        raise LoadCsvError(f"no such file: {filepath}")
    # pandas compression='infer' parity (reference utils.py:38 —
    # pd.read_csv decompresses by EXTENSION, so the reference accepts
    # foo.csv.gz/.bz2/.xz/.zip transparently): decompress driver-side to
    # a temp file so the header/encoding probes and the Spark scan all
    # see plain bytes. Scale note: these containers are unsplittable
    # anyway (one stream), and the reference is single-process through
    # pandas on the same bytes — parity costs nothing extra.
    comp = {".gz": "gzip", ".bz2": "bz2", ".xz": "xz", ".zip": "zip"}.get(
        os.path.splitext(local_path)[1].lower()
    )
    if comp:
        import shutil

        zf = None
        try:
            if comp == "gzip":
                import gzip

                src = gzip.open(local_path, "rb")
            elif comp == "bz2":
                import bz2

                src = bz2.open(local_path, "rb")
            elif comp == "xz":
                import lzma

                src = lzma.open(local_path, "rb")
            else:
                import zipfile

                zf = zipfile.ZipFile(local_path)
                members = zf.namelist()
                if len(members) != 1:
                    zf.close()
                    raise LoadCsvError(
                        f"Multiple files found in ZIP file. Only one file per "
                        f"ZIP: {members}"
                    )
                src = zf.open(members[0])
            fd, plain = tempfile.mkstemp(suffix=".csv")
            try:
                with src, os.fdopen(fd, "wb") as out:
                    shutil.copyfileobj(src, out)
            finally:
                if zf is not None:
                    zf.close()
            _DECOMPRESSED_TEMPS.append(plain)
            local_path = plain
        except LoadCsvError:
            raise
        except Exception as e:
            raise LoadCsvError(str(e)) from e
    # Spark charset naming differs from Python's aliases
    encoding = {"latin-1": "ISO-8859-1", "utf-8": "UTF-8"}.get(
        _detect_encoding(local_path), "UTF-8"
    )
    if len(separator) != 1:
        # A2: pandas routes multi-char separators to its PYTHON engine —
        # regex split, quotes literal, its own ladder quirks (probed;
        # see _load_python_engine). quoting is ignored on that engine.
        return _load_python_engine(
            spark,
            local_path,
            separator,
            encoding,
            skip_errors,
            shape,
            just_strings,
            float_parity,
            _with_counts,
        )
    # A1: files with in-quote newlines (Excel-style multi-line cells) or
    # pandas-skipped space/tab-only lines get a driver-side rewrite so the
    # distributed line-based scan parses them exactly like pandas' C
    # parser (see _rewrite_file; clean files pay only the chunked probe).
    # pandas' header semantics, computed driver-side from the first lines
    # of the ORIGINAL file (the csv module parses quoted newlines and
    # counts trailing empties natively): duplicate names mangle to a,
    # a.1, a.2…, empty cells to 'Unnamed: N' (Spark's own dedup renames
    # BOTH duplicates, which diverges), and the first non-blank DATA
    # row's width decides the implicit index. Data columns map by
    # POSITION via the enforced schema, so only the NAMES come from
    # this parse. Single-char separator guaranteed here (multi-char
    # dispatched to _load_python_engine above).
    try:
        columns, n_index = _read_header(local_path, separator, quoting, encoding)
    except UnicodeDecodeError:
        # a sampled encoding probe can leave a latin-1 byte inside the
        # header/first-rows window undetected — fall back like the
        # reference's whole-file retry
        encoding = "ISO-8859-1"
        columns, n_index = _read_header(local_path, separator, quoting, encoding)
    if shape:
        # pandas usecols (reference utils.py:32-34) never infers an
        # implicit index AND silently truncates rows wider than the
        # header (probed: 'a,b\n1,2,3' + usecols=['a','b'] -> a=1,b=2;
        # a 4-field row later still loads) — no shift, no bad lines.
        n_index = 0
    restore_nl = restore_protect = restore_empty = False
    sentinels: dict[str, str] | None = None
    orig_present: frozenset[int] | None = None
    cr_done = False
    # the encoding probe sampled a prefix on big files — the trigger
    # probe (which streams every byte anyway) validates the UTF-8 tail;
    # an invalid byte flips the whole scan to latin-1 like the
    # reference's whole-file pandas retry (VERDICT_r09 #6)
    tail_check = (
        encoding == "UTF-8" and _encoding_probe_window(local_path) is not None
    )
    for _ in range(2):
        try:
            (q_flag, blank_flag, trail_flag, empties_flag, cr_flag,
             eof_open_row, present) = _scan_rewrite_triggers(
                local_path,
                separator,
                quoting,
                n_index + len(columns),
                validate_utf8=tail_check,
            )
        except UnicodeDecodeError:
            # pandas' retry re-decodes the WHOLE file as latin-1, header
            # included — re-derive the names under the new encoding too
            encoding = "ISO-8859-1"
            columns, n_index = _read_header(
                local_path, separator, quoting, encoding
            )
            if shape:
                n_index = 0
            (q_flag, blank_flag, trail_flag, empties_flag, cr_flag,
             eof_open_row, present) = _scan_rewrite_triggers(
                local_path, separator, quoting, n_index + len(columns)
            )
        tail_check = False  # a second loop pass reads the rewritten temp
        if orig_present is None:
            # the ORIGINAL file's byte presence: a second loop pass scans
            # the rewritten temp, whose inserted sentinel bytes would
            # spuriously enable the ctrl-byte acceptance guard
            orig_present = present
        if eof_open_row is not None:
            # pandas refuses a quoted field still open at EOF — even under
            # on_bad_lines='skip' (probed); the reference wraps the
            # ParserError in LoadCsvError (utils.py:50-51) so the file is
            # isolated, not the run
            raise LoadCsvError(
                "Error tokenizing data. C error: EOF inside string "
                f"starting at row {eof_open_row}"
            )
        # the lone-'\r' pass is once-only: a swallow consumes exactly one
        # separator per '\r' (pandas semantics) — a '\r,' leftover in the
        # rewritten file is ordinary line content, not a new swallow
        do_cr = cr_flag and not cr_done
        # NUL cells need the driver-side rewrite whenever a quote char is
        # active: univocity drops NULs from quoted fields with escaped
        # quotes, so the scan projection alone cannot reproduce pandas'
        # truncate-at-NUL. Under QUOTE_NONE no quoted fields exist and
        # the projection suffices. Per-pass from `present`, so the
        # second (post-swallow) pass over the already-NUL-free rewritten
        # file never re-triggers.
        do_nul = 0 in present and quoting != _QUOTE_NONE
        if do_nul and not empties_flag:
            # NUL deletion can CREATE empty unquoted fields
            # ('y,\x00z' -> 'y,'); their literal-'' visibility matters
            # exactly when a uint64-tier literal exists (the rawtext
            # quirk class) — same 19-digit gate the probe applies to
            # pre-existing empties (r11 review finding #2)
            empties_flag = _has_19_digit_run(local_path)
        if not (q_flag or blank_flag or trail_flag or empties_flag
                or do_cr or do_nul):
            break
        try:
            rewritten, r_nl, r_protect, r_empty, n_swallowed, sentinels = (
                _rewrite_file(
                    local_path,
                    separator,
                    encoding,
                    q_flag,
                    blank_flag,
                    trail_flag,
                    empties_flag,
                    do_cr,
                    sentinels,
                    present,
                    do_nul=do_nul,
                )
            )
        except UnicodeDecodeError:
            # the sampled encoding probe (>256 MB files) guessed wrong
            # past its window: the reference's whole-file pandas read
            # would hit the same error and retry latin-1 (which decodes
            # any byte stream) — do the same for rewrite AND scan
            encoding = "ISO-8859-1"
            rewritten, r_nl, r_protect, r_empty, n_swallowed, sentinels = (
                _rewrite_file(
                    local_path,
                    separator,
                    encoding,
                    q_flag,
                    blank_flag,
                    trail_flag,
                    empties_flag,
                    do_cr,
                    sentinels,
                    present,
                    do_nul=do_nul,
                )
            )
        except MemoryError as e:
            raise LoadCsvError(
                f"file too large for the driver-side rewrite: {e}"
            ) from e
        cr_done = True
        restore_nl |= r_nl
        restore_protect |= r_protect
        restore_empty |= r_empty
        if rewritten is not None:
            local_path = rewritten
        if n_swallowed:
            # a swallowed separator changes the header/implicit-index
            # widths pandas infers — re-derive them from the rewritten
            # file (sentinels undone on the names) and re-run the
            # trigger probe once with the corrected width
            new_cols, new_idx = _read_header(
                local_path, separator, quoting, encoding,
                sentinel_restore=sentinels,
            )
            if shape:
                new_idx = 0
            if new_cols != columns or new_idx != n_index:
                columns, n_index = new_cols, new_idx
                continue
        break

    reader = (
        spark.read.option("header", True)
        .option("sep", separator)
        .option("encoding", encoding)
        .option("inferSchema", False)
        # RFC-4180 doubled-quote escaping, the csv-module/pandas convention
        # (Spark's default escape is backslash, which pandas doesn't use)
        .option("escape", '"')
        # NUL nullValue (can't appear in a CSV cell): QUOTED empty
        # fields then survive as '' strings for the rawtext quirk; the
        # NA mask in infer_reference_types turns '' into SQL NULL
        # everywhere else. Unquoted empties are nulled by the univocity
        # tokenizer itself regardless of options.
        .option("nullValue", "\u0000")
    )
    has_nul = bool(orig_present) and 0 in orig_present
    if quoting == _QUOTE_NONE:
        # csv.QUOTE_NONE: quotes are ordinary characters. NUL works as
        # the disabling quote char only while the file provably contains
        # no NUL byte -- otherwise a genuine NUL would act as a quote
        # char, so pick a file-absent ASCII byte instead (ASCII byte
        # absence == char absence in both utf-8 and latin-1).
        qchar = "\u0000"
        if has_nul:
            # exclude every char of the chosen sentinel assignment too:
            # sentinels are picked from file-ABSENT bytes, exactly the
            # pool this scan draws from — a collision would make the
            # rewritten file's sentinel bytes act as quote chars
            # (r11 review finding #3)
            sent_chars = set("".join(sentinels.values())) if sentinels else set()
            cand = next(
                (
                    b
                    for b in range(1, 0x80)
                    if b not in orig_present
                    and chr(b) not in (separator[:1], "\r", "\n")
                    and chr(b) not in sent_chars
                ),
                None,
            )
            if cand is None:
                raise LoadCsvError(
                    "cannot disable quoting: file contains a NUL and "
                    "every other ASCII byte"
                )
            qchar = chr(cand)
        reader = reader.option("quote", qchar)
    try:
        # A4: pandas treats a row with more fields than the FIRST DATA ROW
        # as a bad line — an error, or dropped under --skip-errors
        # (reference utils.py:42, cli.py:34-38). A first data row k fields
        # wider than the header instead triggers pandas' implicit-index
        # inference: the first k fields of EVERY row become the index,
        # which to_sql(index=False) drops (see _read_header). Spark
        # silently truncates extras, so read with k leading index slots
        # (dropped below) plus one sentinel column beyond: a non-null
        # sentinel marks a bad line.
        idx_cols = [f"__pdindex_{j}__" for j in range(n_index)]
        probe_schema = T.StructType(
            [T.StructField(c, T.StringType()) for c in idx_cols]
            + [T.StructField(c, T.StringType()) for c in columns]
            + [T.StructField(_EXTRA, T.StringType())]
        )
        df = reader.schema(probe_schema).option("enforceSchema", True).csv(local_path)
        # pandas skip_blank_lines (space/tab-only lines skipped anywhere)
        # is handled driver-side by the _rewrite_file strip above — a
        # Spark-side filter cannot distinguish a lone ' ' line (pandas
        # skips) from a ' ,,' row (pandas KEEPS as [' ', NaN, NaN]) once
        # univocity nulls unquoted-empty trailing fields.
        if restore_nl or restore_protect or restore_empty or has_nul:
            # undo the rewrite sentinels (narrow projection; affected
            # files only): in-quote newlines + empty-field byte on every
            # column, the line-protect prefix on the first physical field
            cols = []
            for j, c in enumerate(df.columns):
                col = qcol(c)
                if restore_protect and j == 0:
                    # \Q..\E literal-quotes the per-file protect byte for
                    # the Java regex engine
                    col = F.regexp_replace(
                        col, "^\\Q" + sentinels["protect"] + "\\E", ""
                    )
                if restore_nl:
                    col = _restore_newlines_col(col, sentinels)
                if restore_empty:
                    col = F.replace(
                        col, F.lit(sentinels["empty"]), F.lit("")
                    )
                if has_nul:
                    # pandas' C tokenizer truncates every cell VALUE at
                    # the first NUL byte (probed: quoted, unquoted and
                    # numeric cells alike; tokenization is unaffected).
                    # Gated on the trigger probe's byte-presence set, so
                    # NUL-free files skip the projection entirely.
                    col = F.substring_index(col, "\u0000", 1)
                cols.append(col.alias(c))
            df = df.select(*cols)
        if idx_cols:
            df = df.drop(*idx_cols)
        # pandas NA semantics (default na_values → NULL) are applied by
        # infer_reference_types per-column rather than here: the uint64
        # conflict quirk (probed; see _decide_types) keeps NA tokens as
        # LITERAL text, so the raw strings must survive until the column
        # kind is known. just_strings applies the mask below.
        if shape:
            # usecols mode: extra fields silently truncated (never bad
            # lines — probed, see the n_index note above)
            df = df.drop(_EXTRA)
            bad_lines_pending = False
        elif skip_errors:
            df = df.where(F.col(_EXTRA).isNull()).drop(_EXTRA)
            bad_lines_pending = False
        else:
            bad_lines_pending = True  # verified during the inference pass
    except Exception as e:  # pragma: no cover - spark analysis errors
        raise LoadCsvError(str(e)) from e

    if shape:
        # A6 (reference utils.py:32-34): usecols projection at scan; a shape
        # column missing from the file is a whole-file error
        # (utils.py:54-55, [verified-run] in SURVEY A6).
        wanted = [c.csv_name for c in parse_shape(shape)]
        missing = [c for c in wanted if c not in columns]
        if missing:
            raise LoadCsvError(
                f"Usecols do not match columns, columns expected but not found: {missing}"
            )
        df = df.select(*[qcol(c) for c in wanted])

    if just_strings:
        if bad_lines_pending:
            if df.where(F.col(_EXTRA).isNotNull()).limit(1).count():
                raise LoadCsvError("Error tokenizing data: too many fields")
            df = df.drop(_EXTRA)
        # A7 keeps pandas' NA semantics (dtype=str still na-filters)
        df = df.select(
            *[
                F.when(qcol(c).isin(*_PANDAS_NA_TOKENS), None)
                .otherwise(qcol(c))
                .alias(c)
                for c in df.columns
            ]
        )
        if _with_counts:
            counts = {
                r["__pid__"]: r["__rows__"]
                for r in df.groupBy(F.spark_partition_id().alias("__pid__"))
                .agg(F.count(F.lit(1)).alias("__rows__"))
                .collect()
            }
            return df, counts, {}, {}, set()
        return df  # A7: everything stays StringType (reference utils.py:31)
    return infer_reference_types(
        df,
        check_bad_lines=bad_lines_pending,
        return_partition_counts=_with_counts,
        quoting=quoting,
        na_masked=False,
        float_parity=float_parity,
        ctrl_risk=bool(orig_present & _NONSPACE_CTRL_BYTES),
    )


def _load_python_engine(
    spark: SparkSession,
    local_path: str,
    separator: str,
    encoding: str,
    skip_errors: bool,
    shape: str | None,
    just_strings: bool,
    float_parity: bool | None,
    _with_counts: bool,
):
    """A2 multi-char separator: pandas routes a >1-char sep to its PYTHON
    engine (reference utils.py:38-47 passes sep through), whose semantics
    were probed and are replicated exactly here:

    - each line is str.strip()ped, then re.split(sep, line) — the sep is
      a REGEX (metachars and all: sep='|~|' really yields 8 columns from
      'a|~|b'), QUOTES are ordinary characters, and a line whose
      strip+split yields [''] is skipped anywhere in the file;
    - quoting= is ignored entirely (no QUOTE_NONNUMERIC float mode);
    - implicit-index inference applies EVEN under usecols (unlike the C
      engine) and wide non-first rows under usecols silently truncate;
    - the int ladder loses the C tokenizer's order-dependent float-mode
      escape and int64-with-NULL parses to float FROM the strings — both
      handled via ``infer_reference_types(py_engine=True)``;
    - empty fields are REAL '' strings (no univocity absent-field
      nulling), so trailing empties count toward the bad-line bar and
      rawtext columns keep '' literal with no sentinel machinery.

    Spark-side: one distributed text-shaped scan (csv reader with NUL
    sep+quote so encoding/line-termination handling matches the C path)
    → Arrow-batched re.split (Python's own re → bit-exact regex
    semantics) → positional projection. An invalid regex separator
    raises re.error and propagates — the reference crashes the same way
    (only LoadCsvError is isolated per file).

    Known divergence (documented): a pre-header line of >0x20 unicode
    whitespace (e.g. NBSP) is consumed as the header by Spark's
    header-skip but blank-skipped by pandas — cosmic-ray class.
    """
    import re as _re

    from csvs_to_sqlite_spark.functions.pysplit import split_lines_udf
    from csvs_to_sqlite_spark.operators.shapes import parse_shape

    rx = _re.compile(separator)  # re.error propagates: reference parity
    if encoding == "UTF-8" and _encoding_probe_window(local_path) is not None:
        # this path never runs the trigger probe, so validate the tail
        # here (VERDICT_r09 #6); an invalid byte -> whole-file latin-1,
        # the reference's retry semantics
        dec = codecs.getincrementaldecoder("utf-8")()
        try:
            with open(local_path, "rb") as fb:
                while True:
                    chunk = fb.read(1 << 22)
                    if not chunk:
                        dec.decode(b"", final=True)
                        break
                    dec.decode(chunk)
        except UnicodeDecodeError:
            encoding = "ISO-8859-1"
    py_enc = {"ISO-8859-1": "latin-1"}.get(encoding, "utf-8-sig")
    header = data = None
    with open(local_path, encoding=py_enc, newline=None) as f:
        for line in f:
            fields = rx.split(line.strip())
            if fields == [""]:
                continue  # python-engine blank skip (strip-based)
            if header is None:
                header = fields
            else:
                data = fields
                break
    if header is None:
        raise LoadCsvError("No columns to parse from file")
    # implicit index applies even under usecols here (probed)
    n_index = max(0, len(data) - len(header)) if data else 0
    columns = _pandas_header_names(header)

    _pysplit = split_lines_udf(separator)
    # r11 NUL/ctrl parity for the python-engine path. The text-shaped
    # scan uses NUL as the disabling sep/quote char — valid only while
    # the file provably contains no NUL (a genuine NUL would split the
    # line / act as a quote, silently truncating values: r11
    # differential-fuzz find, seed 881101). And pandas' python engine
    # keeps a line of control bytes as a DATA row whenever line.strip()
    # is non-empty (Python whitespace among <=0x20 is only
    # \t\n\v\f\r \x1c-\x1f and space), while Spark's scan drops every
    # all-<=0x20 line — those lines get a driver-side protect prefix
    # (stripped again below), the same rescue the C path's rewrite does.
    seen1 = _ngram_present(local_path, 1)
    sep0 = quote0 = "\u0000"
    protect0 = None
    if seen1[0]:
        absent = [
            b for b in range(1, 0x80)
            if not seen1[b] and chr(b) not in ("\r", "\n")
        ]
        if len(absent) < 2:
            raise LoadCsvError(
                "cannot read file: contains a NUL and every other ASCII byte"
            )
        sep0, quote0 = chr(absent[0]), chr(absent[1])
    # line body class = <=0x20 minus the \r\n terminators (a class
    # including them would greedily span lines); keep-class = controls
    # that are NOT Python whitespace (\x1c-\x1f ARE)
    keepctrl = _re.compile(
        rb"(?:\A|(?<=[\r\n]))[\x00-\x09\x0b\x0c\x0e-\x20]*"
        rb"[\x00-\x08\x0e-\x1b][\x00-\x09\x0b\x0c\x0e-\x20]*"
        rb"(?=[\r\n]|\Z)"
    )
    # gate on the presence bitmap first: only files carrying a
    # keep-class byte at all scan for protect-class lines
    if any(seen1[b] for b in (*range(0x00, 0x09), *range(0x0E, 0x1C))):
        cand = next(
            (
                chr(b)
                for b in range(0x21, 0x80)
                if not seen1[b] and chr(b) not in (sep0, quote0)
            ),
            None,
        )
        if cand is None:
            raise LoadCsvError(
                "cannot protect control-only lines: file uses every "
                "printable ASCII byte"
            )
        pb = cand.encode()
        n_protected = 0
        fd, tmp = tempfile.mkstemp(suffix=".csv")

        def _sub(m):
            nonlocal n_protected
            n_protected += 1
            return pb + m.group(0)

        with open(local_path, "rb") as fsrc, os.fdopen(fd, "wb") as out:
            carry = b""
            while True:
                chunk = fsrc.read(1 << 22)
                if not chunk:
                    out.write(keepctrl.sub(_sub, carry))
                    break
                buf = carry + chunk
                cut = max(buf.rfind(b"\n"), buf.rfind(b"\r"))
                if cut < 0:
                    carry = buf
                    continue
                out.write(keepctrl.sub(_sub, buf[: cut + 1]))
                carry = buf[cut + 1 :]
        if n_protected:
            _DECOMPRESSED_TEMPS.append(tmp)
            local_path = tmp
            protect0 = cand
        else:
            os.unlink(tmp)
    try:
        raw = (
            spark.read.option("header", True)
            .option("sep", sep0)
            .option("quote", quote0)
            .option("encoding", encoding)
            .option("inferSchema", False)
            .schema(T.StructType([T.StructField(columns[0], T.StringType())]))
            .option("enforceSchema", True)
            .csv(local_path)
        )
    except Exception as e:  # pragma: no cover - spark analysis errors
        # A13 parity with the C path (review drift finding): Spark
        # analysis errors stay inside the per-file isolation boundary
        raise LoadCsvError(str(e)) from e

    # pandas' blank skip is POST-split: a row is skipped iff
    # re.split(sep, line.strip()) == [''] (probed: under an EMPTY-
    # MATCHING regex sep like '|~|' a blank line splits to ['',''] and
    # becomes an all-NaN ROW, not a skip). For ordinary seps that
    # predicate reduces to strip(line)=='' , filtered here JVM-SIDE on
    # the raw line so the split UDF is evaluated exactly once (Catalyst
    # would duplicate a post-split filter into a second Arrow stage —
    # plan-asserted). Class ~ Python str.strip()'s whitespace; the
    # <=0x20-only lines Spark's scan would drop are rescued above when
    # pandas KEEPS them (protect prefix for lines carrying a
    # non-Python-whitespace control — r11; \x1c-\x1f ARE Python
    # whitespace, so those lines skip on both sides). Remaining
    # documented cosmic-class divergence: blank lines under an
    # empty-matching sep (pandas: NaN rows; the scan dropped them).
    if _re.search(separator, "") is None:
        raw = raw.where(
            ~qcol(columns[0]).rlike(r"^[\s\x00-\x20\p{IsWhite_Space}]*$")
        )
    line_col = qcol(columns[0])
    if protect0 is not None:
        # strip the protect prefix AFTER the blank filter above (the
        # protected line must not look blank to it) and before the split
        line_col = F.regexp_replace(
            line_col, "^\\Q" + protect0 + "\\E", ""
        )
    arr = raw.select(_pysplit(line_col).alias("__arr__"))
    idx_cols = [f"__pdindex_{j}__" for j in range(n_index)]
    width = len(idx_cols) + len(columns)
    sel = [
        # F.get: NULL on out-of-range (narrow rows fill like pandas NaN)
        F.get(F.col("__arr__"), j).alias(c)
        for j, c in enumerate(idx_cols + list(columns))
    ]
    sel.append(F.when(F.size("__arr__") > width, F.lit("x")).alias(_EXTRA))
    df = arr.select(*sel)
    if idx_cols:
        df = df.drop(*idx_cols)
    if shape:
        wanted = [c.csv_name for c in parse_shape(shape)]
        missing = [c for c in wanted if c not in columns]
        if missing:
            raise LoadCsvError(
                f"Usecols do not match columns, columns expected but not found: {missing}"
            )
        # usecols: wide rows silently truncate (probed — no bad lines)
        df = df.select(*[qcol(c) for c in wanted])
        bad_lines_pending = False
    elif skip_errors:
        df = df.where(F.col(_EXTRA).isNull()).drop(_EXTRA)
        bad_lines_pending = False
    else:
        bad_lines_pending = True

    if just_strings:
        if bad_lines_pending:
            if df.where(F.col(_EXTRA).isNotNull()).limit(1).count():
                raise LoadCsvError("Error tokenizing data: too many fields")
            df = df.drop(_EXTRA)
        df = df.select(
            *[
                F.when(qcol(c).isin(*_PANDAS_NA_TOKENS), None)
                .otherwise(qcol(c))
                .alias(c)
                for c in df.columns
            ]
        )
        if _with_counts:
            counts = {
                r["__pid__"]: r["__rows__"]
                for r in df.groupBy(F.spark_partition_id().alias("__pid__"))
                .agg(F.count(F.lit(1)).alias("__rows__"))
                .collect()
            }
            return df, counts, {}, {}, set()
        return df
    return infer_reference_types(
        df,
        check_bad_lines=bad_lines_pending,
        return_partition_counts=_with_counts,
        quoting=0,  # quoting is ignored by the python engine (probed)
        na_masked=False,
        float_parity=float_parity,
        py_engine=True,
        ctrl_risk=_has_nonspace_ctrl(local_path),
    )


def _decide_types(
    data_cols: list[str],
    row,
    quoting: int,
    bool_ok: dict[str, bool],
    bool_first_null: dict[str, bool],
    float_parity: bool | None = False,
    py_engine: bool = False,
) -> tuple[dict[str, str], dict[str, str]]:
    """The pandas dtype decision table, shared by the persist-cache path
    and the single-pass spill path (pandas → SQLite affinity,
    differential-tested against the reference):

    - all-null           → float64 of NaN → C1 → INTEGER column, NULLs
    - all int-strings,
        all fit int64    → int64 → INTEGER (with NULLs: float64 upcast
                           from the EXACT int64 values; float_parity also
                           makes the stored values doubles)
        some beyond u64  → object → TEXT  (order-dependent: a POSITIVE
                           beyond-uint64 int only blocks when no float-
                           notation value precedes it; huge negatives
                           never block — probed, they ride float mode)
        int64 < v ≤ u64  → uint64 → INTEGER affinity, values as doubles
                           (the reference CRASHES in to_sql here —
                           OverflowError binding ints > int64; staying
                           graceful is a documented divergence)…
                           …UNLESS NULLs or negative ints sit alongside:
                           pandas' uint64-conflict ValueError falls back
                           to object WITHOUT NA masking, so the column is
                           TEXT with NA tokens kept as literal strings
                           (kind ``rawtext``; probed exhaustively in
                           tests/test_uint64_quirks.py)
    - all float-castable → float64; C1 all-integral keeps DOUBLE values
                           but emits INTEGER affinity (SQLite coerces per
                           value, exactly like to_sql)
    - all True/False, no NULLs → bool → INTEGER 0/1; with NULLs, affinity
                           from the reference's first-row sample
    - else               → object → TEXT

    Returns ({column: kind}, {column: DDL override}) with kind one of
    ``allnull | long | longfloat | double | pdouble | rawtext | bool |
    text`` (``longfloat``/``pdouble`` on every float column when
    float_parity=True, on risk-flagged columns under AUTO=None, never
    when False)."""
    kinds: dict[str, str] = {}
    overrides: dict[str, str] = {}
    total_rows = row["__rows__"]

    # pdouble = parity-parsed double values (precise_xstrtod); plain
    # 'double' keeps Spark's exact cast — the uint64-clean tier must stay
    # exact (pandas holds those as exact uint64, not parsed floats).
    # float_parity tri-state: True = parity everywhere, False = never,
    # None (AUTO, default) = only columns whose risk probe fired (the
    # two parses are bit-identical on risk-free columns).
    def _parity_col(i: int) -> bool:
        if float_parity is None:
            return bool((row[f"c{i}_bits"] or 0) & 8)
        return bool(float_parity)

    for i, c in enumerate(data_cols):
        n = row[f"c{i}_n"]
        first_big = row[f"c{i}_firstbig"]
        first_float = row[f"c{i}_firstfloat"]
        # python engine (py_engine): ANY beyond-uint64 int objects the
        # column — there is no C-tokenizer "already in float mode" escape
        big_blocks = first_big is not None and (
            py_engine or first_float is None or first_float > first_big
        )
        if n == 0:
            kinds[c] = "allnull"
        elif (
            quoting == _QUOTE_NONNUMERIC
            and (row[f"c{i}_re"] == n or row[f"c{i}_dbl"] == n)
            and row[f"c{i}_ovf"] == 0
        ):
            # QUOTE_NONNUMERIC: any numeric column is float64 — int64,
            # uint64 and beyond-uint64 tiers all collapse into this branch
            # (probed: quoting=2 values match precise_xstrtod, including
            # pure-int columns)
            kinds[c] = "pdouble" if _parity_col(i) else "double"
            if row[f"c{i}_nonint"] == 0:
                overrides[c] = "INTEGER"
        elif big_blocks:
            kinds[c] = "text"
        elif row[f"c{i}_re"] == n:
            if row[f"c{i}_long"] == n:
                if _parity_col(i) and n < total_rows:
                    # C engine: pandas upcasts int64-with-NaN to float64
                    # from the EXACT int64 values; ≥2^53 they drift from
                    # the ints (AUTO: only when a >15-char cell makes
                    # drift possible — below 2^53 long and double agree).
                    # python engine instead parses the STRINGS to float
                    # (probed: '9223372036854775807'+NA → …778e18, the
                    # precise_xstrtod value) → parity parse.
                    kinds[c] = "pdouble" if py_engine else "longfloat"
                    overrides[c] = "INTEGER"
                else:
                    kinds[c] = "long"
            elif (row[f"c{i}_bits"] or 0) & 1:  # uint64-tier int present
                if n < total_rows or ((row[f"c{i}_bits"] or 0) & 2):
                    # uint64 conflict (NULL or negative alongside a
                    # uint64-tier int): object WITHOUT NA masking
                    kinds[c] = "rawtext"
                else:
                    # uint64-clean: INTEGER affinity, values as doubles
                    kinds[c] = "double"
                    overrides[c] = "INTEGER"
            else:
                # negative ints overflowing int64 (no uint64 candidate):
                # pandas falls back to plain (masked) object
                kinds[c] = "text"
        elif row[f"c{i}_dbl"] == n and row[f"c{i}_ovf"] == 0:
            bits_i = row[f"c{i}_bits"] or 0
            triggers = [
                x
                for x in (
                    row[f"c{i}_firstu64"], row[f"c{i}_firstnegovf"]
                )
                if x is not None
            ]
            first_trigger = min(triggers) if triggers else None
            first_negf = row[f"c{i}_firstnegf"]
            # C-engine ladder conflict in FLOAT territory (r11; probed
            # over every length-2/3 sequence of {u64-tier,
            # negative-overflow/beyond int, +int, -int, +float, -float}
            # + NULL variants): with a trigger int present (u64 tier OR
            # an int-notation negative overflowing int64), the column
            # converts to float ONLY if a POSITIVE float-notation value
            # exists anywhere or a NEGATIVE one occurs before the first
            # trigger. Otherwise object — NA tokens stay LITERAL iff a
            # u64-tier value is involved (rawtext), and are masked for
            # the pure negative-overflow family (text). The python
            # engine converts all of these to float (probed) except its
            # own bit-16 class below.
            conflict = (
                first_trigger is not None
                and first_negf is not None
                and row[f"c{i}_firstposf"] is None
                and not first_negf < first_trigger
            )
            if py_engine and (bits_i & 16):
                # a negative-overflow int among floats: the python
                # engine objects the column (no float-mode escape)
                kinds[c] = "text"
            elif (not py_engine) and conflict:
                kinds[c] = "rawtext" if (bits_i & 1) else "text"
            else:
                kinds[c] = "pdouble" if _parity_col(i) else "double"
                if row[f"c{i}_nonint"] == 0:
                    overrides[c] = "INTEGER"  # C1 affinity-only downcast
        elif bool_ok.get(c):
            # keep BooleanType: the sink writes 0/1 (INTEGER affinity),
            # dim extraction renders 'True'/'False' like six.text_type
            kinds[c] = "bool"
            if bool_first_null.get(c):
                overrides[c] = "TEXT"
        else:
            kinds[c] = "text"
    return kinds, overrides


def _infer_flag_agg_columns(
    mask_stage,
    data_cols,
    check_bad_lines: bool,
    float_parity,
    py_engine: bool,
    ctrl_risk: bool,
):
    """Column-op constructor for the inference flag projection and
    aggregates — the certified general path (ctrl_risk guard,
    parity_double pandas UDF). The common case goes through the
    SQL-string twins below (_infer_flag_exprs/_infer_agg_exprs),
    which must stay expression-for-expression in lockstep — locked by
    tests/test_sources_golden.py::test_infer_sql_fast_path_equivalence.
    """
    from csvs_to_sqlite_spark.functions.pandasfloat import parity_double

    int_re = r"^\s*[+-]?[0-9]+\s*$"
    proj = [F.col("__pos__")]
    if check_bad_lines:
        proj.append(F.col(_EXTRA))
    for i, c in enumerate(data_cols):
        q = F.col(f"__m{i}")
        # Spark's toDouble trims EVERY char <= 0x20 off both ends; pandas'
        # number parsers skip only C isspace ('\t\n\v\f\r '). A cell like
        # '1\x01' is numeric to Spark but object to pandas (probed) — when
        # the file is known to CONTAIN such bytes (ctrl_risk, from the
        # trigger probe's byte-presence set), the acceptance gate rejects
        # cells carrying them; clean files skip the guard entirely.
        d0 = q.try_cast("double")
        if ctrl_risk:
            d = F.when(
                d0.isNotNull()
                & (
                    F.length(F.translate(q, _NONSPACE_CTRL, ""))
                    == F.length(q)
                ),
                d0,
            )
        else:
            d = d0
        # the int regex only ever matches double-castable strings (digits,
        # optional sign/whitespace — Spark's toDouble trims and accepts all
        # of them, saturating huge ones to ±inf), so gating on d short-
        # circuits the regex away for date/text columns (CASE WHEN skips
        # the branch; measured ~15% off the whole inference pass at sf0.1)
        re_b = F.when(d.isNotNull(), q.rlike(int_re)).otherwise(F.lit(False))
        # ≤18 digits always fits int64; the cast only runs on longer
        # matches (same trick for the beyond-uint64 decimal(20,0) probe:
        # ≤19 digits always fits uint64)
        ntrim = F.length(F.trim(q))
        proj.append(q.isNotNull().alias(f"p{i}_nn"))
        proj.append(re_b.alias(f"p{i}_re"))
        proj.append(d.alias(f"p{i}_d"))
        # int-looking strings that actually fit in int64 (pandas keeps a
        # column with overflowing ints as object → TEXT)
        fits_long = F.when(
            re_b,
            (ntrim <= 18) | q.try_cast("long").isNotNull(),
        ).otherwise(F.lit(False))
        proj.append(fits_long.alias(f"p{i}_long"))
        # pandas' int ladder classes (probed end-to-end, see
        # tests/test_uint64_quirks.py):
        #   B (p_big):  POSITIVE int strings beyond uint64 max — these
        #               abort the uint64 attempt (order-dependent float
        #               blocker). Negatives are never uint64 candidates
        #               and take the seen-sint path instead, so a huge
        #               negative must NOT block float mode (probed:
        #               ['-9.9e24-ish int', '0.5'] is float64).
        #   U (p_u64):  positive, > int64 max, ≤ uint64 max — the uint64
        #               tier; with NULLs or negative ints alongside,
        #               pandas raises the uint64-conflict and the column
        #               falls back to object WITHOUT NA masking.
        #   G (p_neg):  any negative int string (seen_sint).
        # negativity via the double cast already in hand (d < 0), never a
        # per-cell regex. ("-0" casts to -0.0 which is not < 0, but it
        # fits int64 and never reaches the uint64 ladder anyway.)
        # These two expressions (and _ovf below) are built as ONE parsed
        # SQL string each instead of ~30 Column ops: plan-construction
        # py4j chatter is real wall time on the ingest path (+0.65s per
        # 16-column import measured for the op-by-op variant). Runtime
        # subexpression elimination dedupes the repeated casts/regex.
        mc = f"`__m{i}`"
        sql_d = f"try_cast({mc} as double)"
        sql_re = (
            f"({sql_d} is not null and"
            f" {mc} rlike '^\\\\s*[+-]?[0-9]+\\\\s*$')"
        )
        sql_dec = f"try_cast({mc} as decimal(20,0))"
        sql_beyond = (
            f"case when {sql_re} and {sql_d} > 0.0d"
            f" and length(trim({mc})) > 19"
            f" then ({sql_dec} is null or {sql_dec} > 18446744073709551615bd)"
            f" else false end"
        )
        proj.append(F.expr(sql_beyond).alias(f"p{i}_big"))
        # the three remaining ladder inputs are mutually exclusive by sign
        # (negative int / zero-with-exponent / positive uint64-tier), so
        # ONE small-int class column + ONE bit_or aggregate carries all
        # their presence bits — 1/3 the plan nodes and agg buffers of
        # separate boolean columns
        sql_long = (
            f"case when {sql_re} then (length(trim({mc})) <= 18"
            f" or try_cast({mc} as bigint) is not null) else false end"
        )
        sql_bits = (
            f"case when {sql_re} and {sql_d} < 0.0d then 2"
            f" when {sql_d} = 0.0d and"
            f" (contains({mc}, 'e') or contains({mc}, 'E')) then 4"
            f" when {sql_re} and {sql_d} > 0.0d"
            f" and not {sql_long} and not {sql_beyond} then 1"
            f" else 0 end"
        )
        if float_parity is None:
            # AUTO float parity: bit 8 flags cells where precise_xstrtod
            # can differ from Spark's correctly rounded cast — >15
            # trimmed chars (possibly >15 significant digits, incl. int64
            # past 2^53 that pandas upcasts through float64) or exponent
            # notation. Everything shorter is an exact <2^53 integer
            # divided once by an exact power of ten in BOTH parsers.
            # Gated behind the shared int-regex so int cells never pay
            # the contains() calls; rides the bits column (no extra
            # aggregate buffer).
            sql_bits = (
                f"({sql_bits}) | (case when {sql_d} is not null and"
                f" (length(trim({mc})) > 15 or (not {sql_re} and"
                f" (contains({mc}, 'e') or contains({mc}, 'E'))))"
                f" then 8 else 0 end)"
            )
        if py_engine:
            # bit 16: negative int overflowing int64 — the python engine
            # (multi-char separators) objects the whole column on one,
            # even among float siblings (no C-tokenizer float-mode
            # escape; probed)
            sql_bits = (
                f"({sql_bits}) | (case when {sql_re} and {sql_d} < 0.0d"
                f" and not {sql_long} then 16 else 0 end)"
            )
        proj.append(F.expr(sql_bits).alias(f"p{i}_bits"))
        # sign of float-NOTATION cells by their raw text ('-0.0'/'-0e5'
        # cast to -0.0 which is not < 0.0d, yet pandas' ladder treats
        # them as negative) — null for non-floatish cells
        proj.append(
            F.expr(
                f"case when {sql_d} is not null and not {sql_re}"
                f" then startswith(ltrim({mc}), '-') else null end"
            ).alias(f"p{i}_negf")
        )
        # overflow-notation floats ('1e309'): pandas' C parser sets ERANGE
        # and falls back to object (TEXT column), while Spark's cast
        # saturates to ±Infinity. Digit-bearing strings that cast to inf
        # are parse FAILURES; bare inf KEYWORDS are accepted only in
        # pandas' exact raw forms (inf/infinity, optional sign, case-
        # insensitive, NO surrounding whitespace — probed: ' inf' and
        # 'inf ' make the column object while Spark's cast trims them).
        # Applies to QUOTE_NONNUMERIC too — probed: pandas 2.2 quoting=2
        # also objects the whole column on an overflow literal. (CASE
        # short-circuits: the regexes only run on ±inf rows.)
        proj.append(
            F.expr(
                f"case when abs({sql_d}) = cast('Infinity' as double) then"
                f" ({mc} rlike '[0-9]' or"
                f" not {mc} rlike '^[+-]?(?i)(inf|infinity)$')"
                f" else false end"
            ).alias(f"p{i}_ovf")
        )
        # bool candidacy rides the SAME pass (one lower+IN per cell is far
        # cheaper than the second full scan the deferred probe used to
        # cost — lineitem-shaped files make EVERY text/date column
        # "undecided", so the probe re-read the whole file)
        proj.append(
            F.lower(q).isin("true", "false").alias(f"p{i}_bool")
        )
        if float_parity:
            # pandas-parity float values ride the same scan so the C1
            # integrality/affinity decision sees the values pandas would
            # produce (e.g. '0.000000000000000000001' collapses to 0.0,
            # flipping the column to INTEGER affinity)
            proj.append(parity_double(q).alias(f"p{i}_pd"))
        # (AUTO float-parity risk detection rides p{i}_bits — bit 8,
        # built below. Risky columns pay a column-pruned parity pass
        # AFTER the aggregate; the hot path stays JVM-side.)
    base = mask_stage.select(*proj)
    mid = F.col("__pos__")
    aggs = [F.count(F.lit(1)).alias("__rows__")]
    for i, c in enumerate(data_cols):
        nn = F.col(f"p{i}_nn")
        re_b = F.col(f"p{i}_re")
        d = F.col(f"p{i}_d")
        aggs.append(F.count(F.when(nn, 1)).alias(f"c{i}_n"))
        aggs.append(F.count(F.when(F.col(f"p{i}_bool"), 1)).alias(f"c{i}_bool"))
        aggs.append(F.count(F.when(re_b, 1)).alias(f"c{i}_re"))
        aggs.append(F.count(F.when(F.col(f"p{i}_long"), 1)).alias(f"c{i}_long"))
        # pandas' order-dependent overflow rule: an int-string beyond even
        # uint64 makes the column object UNLESS a float-notation value
        # occurred before it (then the parser is already in float mode)
        is_floatish = d.isNotNull() & ~re_b
        aggs.append(F.min(F.when(F.col(f"p{i}_big"), mid)).alias(f"c{i}_firstbig"))
        aggs.append(F.min(F.when(is_floatish, mid)).alias(f"c{i}_firstfloat"))
        # r11 uint64-negative ladder (probed, 70-sequence table in
        # test_uint64_quirks): the column stays float ONLY if a POSITIVE
        # float-notation value exists anywhere, or a NEGATIVE one occurs
        # before the first uint64-tier int; otherwise uint64 + any
        # negative (int or float, by NOTATION) -> object without NA mask
        negf = F.col(f"p{i}_negf")
        aggs.append(F.min(F.when(negf, mid)).alias(f"c{i}_firstnegf"))
        aggs.append(F.min(F.when(~negf, mid)).alias(f"c{i}_firstposf"))
        aggs.append(
            F.min(
                F.when(F.col(f"p{i}_bits").bitwiseAND(1) == 1, mid)
            ).alias(f"c{i}_firstu64")
        )
        aggs.append(
            F.min(
                F.when(
                    re_b & (d < 0) & ~F.col(f"p{i}_long"), mid
                )
            ).alias(f"c{i}_firstnegovf")
        )
        # presence bits: 1 = uint64-tier int, 2 = negative int,
        # 4 = zero-valued exponent-bearing cell (the uint64-conflict and
        # '0e309' phase-2 inputs)
        aggs.append(F.bit_or(F.col(f"p{i}_bits")).alias(f"c{i}_bits"))
        aggs.append(F.count(d).alias(f"c{i}_dbl"))
        aggs.append(F.count(F.when(F.col(f"p{i}_ovf"), 1)).alias(f"c{i}_ovf"))
        # the C1/%g decisions must see the values the typed projection
        # will produce: the parity parse where enabled, Spark's correctly
        # rounded cast otherwise
        dv = F.col(f"p{i}_pd") if float_parity else d
        # subnormal doubles (|x| < 2^-1022): Java's %g formats these from
        # the shortest decimal repr and diverges from CPython — the engine
        # only pays the exact-%g Arrow fallback in its fact-sized spill
        # canonicalization when this count is nonzero (it almost never is)
        aggs.append(
            F.count(
                F.when((F.abs(dv) < 2.2250738585072014e-308) & (dv != 0.0), 1)
            ).alias(f"c{i}_subn")
        )
        # C1 (reference utils.py:290-303): `not np.isnan(v) and not
        # v.is_integer()` — NaN is SKIPPED (it's pandas-missing), inf is
        # non-integral. Integrality via `% 1.0` (stays in double): floor()
        # returns BIGINT and silently overflows for values like 1e25,
        # which would misclassify huge integral floats as non-integral
        # (caught by differential fuzz seed 9501).
        aggs.append(
            F.count(
                F.when(
                    dv.isNotNull()
                    & ~F.isnan(dv)
                    & (((dv % F.lit(1.0)) != 0.0) | (F.abs(dv) == float("inf"))),
                    1,
                )
            ).alias(f"c{i}_nonint")
        )
    if check_bad_lines:
        aggs.append(F.count(F.col(_EXTRA)).alias("__n_bad__"))
    return base, aggs


def _infer_flag_exprs(
    data_cols,
    check_bad_lines: bool,
    float_parity,
    py_engine: bool,
) -> list[str]:
    """SQL-string twin of the flag projection in _infer_flag_agg_columns
    (optimization r12): the whole per-column expression set ships through
    ONE selectExpr py4j call instead of ~40 Column ops per column. Only
    for the common case (no ctrl_risk guard, float_parity is not True) —
    expression-for-expression lockstep with the Column constructor is
    locked by test_infer_sql_fast_path_equivalence."""
    proj = ["`__pos__`"]
    if check_bad_lines:
        proj.append(f"`{_EXTRA}`")
    for i, _c in enumerate(data_cols):
        mc = f"`__m{i}`"
        sql_d = f"try_cast({mc} as double)"
        sql_re = (
            f"({sql_d} is not null and"
            f" {mc} rlike '^\\\\s*[+-]?[0-9]+\\\\s*$')"
        )
        sql_dec = f"try_cast({mc} as decimal(20,0))"
        sql_beyond = (
            f"case when {sql_re} and {sql_d} > 0.0d"
            f" and length(trim({mc})) > 19"
            f" then ({sql_dec} is null or {sql_dec} > 18446744073709551615bd)"
            f" else false end"
        )
        sql_long = (
            f"case when {sql_re} then (length(trim({mc})) <= 18"
            f" or try_cast({mc} as bigint) is not null) else false end"
        )
        sql_bits = (
            f"case when {sql_re} and {sql_d} < 0.0d then 2"
            f" when {sql_d} = 0.0d and"
            f" (contains({mc}, 'e') or contains({mc}, 'E')) then 4"
            f" when {sql_re} and {sql_d} > 0.0d"
            f" and not {sql_long} and not {sql_beyond} then 1"
            f" else 0 end"
        )
        if float_parity is None:
            sql_bits = (
                f"({sql_bits}) | (case when {sql_d} is not null and"
                f" (length(trim({mc})) > 15 or (not {sql_re} and"
                f" (contains({mc}, 'e') or contains({mc}, 'E'))))"
                f" then 8 else 0 end)"
            )
        if py_engine:
            sql_bits = (
                f"({sql_bits}) | (case when {sql_re} and {sql_d} < 0.0d"
                f" and not {sql_long} then 16 else 0 end)"
            )
        proj.append(f"{mc} is not null as `p{i}_nn`")
        # F.when(d.isNotNull(), rlike).otherwise(false): null d -> false
        proj.append(
            f"case when {sql_d} is not null then"
            f" {mc} rlike '^\\\\s*[+-]?[0-9]+\\\\s*$'"
            f" else false end as `p{i}_re`"
        )
        proj.append(f"{sql_d} as `p{i}_d`")
        proj.append(f"{sql_long} as `p{i}_long`")
        proj.append(f"{sql_beyond} as `p{i}_big`")
        proj.append(f"{sql_bits} as `p{i}_bits`")
        proj.append(
            f"case when {sql_d} is not null and not {sql_re}"
            f" then startswith(ltrim({mc}), '-') else null end"
            f" as `p{i}_negf`"
        )
        proj.append(
            f"case when abs({sql_d}) = cast('Infinity' as double) then"
            f" ({mc} rlike '[0-9]' or"
            f" not {mc} rlike '^[+-]?(?i)(inf|infinity)$')"
            f" else false end as `p{i}_ovf`"
        )
        proj.append(f"lower({mc}) in ('true', 'false') as `p{i}_bool`")
    return proj


def _infer_agg_exprs(data_cols, check_bad_lines: bool) -> list[str]:
    """SQL-string twin of the aggregate list in _infer_flag_agg_columns —
    see _infer_flag_exprs for the contract."""
    aggs = ["count(1) as `__rows__`"]
    for i, _c in enumerate(data_cols):
        aggs.append(f"count(case when `p{i}_nn` then 1 end) as `c{i}_n`")
        aggs.append(
            f"count(case when `p{i}_bool` then 1 end) as `c{i}_bool`"
        )
        aggs.append(f"count(case when `p{i}_re` then 1 end) as `c{i}_re`")
        aggs.append(
            f"count(case when `p{i}_long` then 1 end) as `c{i}_long`"
        )
        aggs.append(
            f"min(case when `p{i}_big` then `__pos__` end)"
            f" as `c{i}_firstbig`"
        )
        aggs.append(
            f"min(case when `p{i}_d` is not null and not `p{i}_re`"
            f" then `__pos__` end) as `c{i}_firstfloat`"
        )
        aggs.append(
            f"min(case when `p{i}_negf` then `__pos__` end)"
            f" as `c{i}_firstnegf`"
        )
        aggs.append(
            f"min(case when not `p{i}_negf` then `__pos__` end)"
            f" as `c{i}_firstposf`"
        )
        aggs.append(
            f"min(case when (`p{i}_bits` & 1) = 1 then `__pos__` end)"
            f" as `c{i}_firstu64`"
        )
        aggs.append(
            f"min(case when `p{i}_re` and `p{i}_d` < 0 and not `p{i}_long`"
            f" then `__pos__` end) as `c{i}_firstnegovf`"
        )
        aggs.append(f"bit_or(`p{i}_bits`) as `c{i}_bits`")
        aggs.append(f"count(`p{i}_d`) as `c{i}_dbl`")
        aggs.append(f"count(case when `p{i}_ovf` then 1 end) as `c{i}_ovf`")
        # the fast path never runs under float_parity=True, so the C1
        # decisions read the plain cast column like the Column twin's
        # dv = d branch
        aggs.append(
            f"count(case when abs(`p{i}_d`) < 2.2250738585072014E-308D"
            f" and `p{i}_d` != 0.0D then 1 end) as `c{i}_subn`"
        )
        aggs.append(
            f"count(case when `p{i}_d` is not null and not isnan(`p{i}_d`)"
            f" and ((`p{i}_d` % 1.0D) != 0.0D or"
            f" abs(`p{i}_d`) = double('Infinity')) then 1 end)"
            f" as `c{i}_nonint`"
        )
    if check_bad_lines:
        aggs.append(f"count(`{_EXTRA}`) as `__n_bad__`")
    return aggs


def infer_reference_types(
    df: DataFrame,
    check_bad_lines: bool = False,
    return_partition_counts: bool = False,
    quoting: int = 0,
    na_masked: bool = True,
    float_parity: bool | None = None,
    py_engine: bool = False,
    ctrl_risk: bool = False,
):
    """Reproduce pandas read_csv dtype inference over an all-string frame.

    pandas outcome per column: int64 if every non-null parses as int,
    float64 if every non-null parses as float, bool if every non-null is
    True/False, else object. One aggregate job computes all columns'
    verdicts at once (scales: single scan, partial aggregation map-side).

    ``quoting=2`` (csv.QUOTE_NONNUMERIC, reference utils.py:41 passing it
    to pandas): the C parser converts numeric fields to float at parse
    time, so every column that would infer int64 — including all-quoted
    digit strings and ints beyond int64/uint64, probed on pandas 2.2 —
    lands as float64 instead; bool and object inference are unchanged,
    and the order-dependent big-int overflow rule never applies.
    ``quoting=1`` (QUOTE_ALL) changes nothing on the read side — the csv
    module only distinguishes it when WRITING — so it takes the default
    path (differential-tested).

    With ``return_partition_counts`` the same pass also yields per-scan-
    partition row counts (grouped by spark_partition_id) for row-id
    assignment, and the return value is ``(typed_df, {pid: rows})``.

    ``na_masked=False`` means ``df`` still holds the RAW cell strings and
    the pandas NA-token mask is applied here, per column — required for the
    uint64-conflict quirk (kind ``rawtext``), where pandas keeps NA tokens
    as literal text. ``float_parity`` (default: the tri-state
    SPARK_GRAFT_PANDAS_FLOAT_PARITY env toggle — unset means AUTO) parses
    float-column VALUES with the pandas precise_xstrtod port instead of
    Spark's correctly rounded cast: every float column when True, only
    risk-flagged columns under AUTO, never when False — see
    functions/pandasfloat.py.
    """
    from csvs_to_sqlite_spark.functions.pandasfloat import (
        parity_double,
        parity_enabled,
    )

    if float_parity is None:
        float_parity = parity_enabled()
    data_cols = [c for c in df.columns if c != _EXTRA]
    if not data_cols:
        return (df, {}, {}, {}, set()) if return_partition_counts else df

    if na_masked:
        def m(c):
            return qcol(c)
    else:
        def m(c):
            return (
                F.when(qcol(c).isin(*_PANDAS_NA_TOKENS), None)
                .otherwise(qcol(c))
            )
    # integer-ness via regex, not try_cast("long"): Spark's string→long cast
    # rejects non-integers through an exception path (~5× slower on columns
    # with decimal values). The regex matches exactly what pandas parses as
    # int64 (optional sign/whitespace, digits only).
    # scan-order position for order-sensitive rules (pandas' conversion
    # state machine); mid = pid<<33|seq is globally ordered for file scans.
    # Materialized as a column first: Spark rejects nondeterministic
    # expressions inside aggregate functions.
    df = df.withColumn("__pos__", F.monotonically_increasing_id())
    # Stage 0: evaluate the NA mask ONCE per cell. The p-flag expressions
    # below reference each cell ~8 times; inlining the 18-token isin CASE
    # into every use doubled the sf0.1 ingest wall (13.3s vs 6.7s) —
    # Catalyst's CollapseProject keeps a non-cheap alias shared instead of
    # re-inlining it, so a separate narrow select restores the floor.
    # Partition ids and scan order are unchanged (narrow transform).
    mask_stage = df.select(
        F.col("__pos__"),
        *([F.col(_EXTRA)] if check_bad_lines else []),
        *[m(c).alias(f"__m{i}") for i, c in enumerate(data_cols)],
    )
    source_cache = None
    if return_partition_counts:
        # engine fast path: the same parse feeds the inference aggregate AND
        # the engine's canonical spill write — cache the MASKED strings so
        # the CSV is tokenized and na-masked exactly once (MEMORY_AND_DISK:
        # spills, never fails). The engine unpersists via the
        # __source_cache__ handle after its spill write. The raw frame `df`
        # stays uncached: only the uint64-conflict rawtext path reads it,
        # and that re-parse is paid solely when such a column exists.
        from pyspark import StorageLevel

        source_cache = mask_stage.persist(StorageLevel.MEMORY_AND_DISK)
        mask_stage = source_cache
    # Pre-project every shared per-row expression ONCE (regex matches and
    # numeric casts are the expensive ops; referenced directly inside ~9
    # aggregate expressions per column Spark re-evaluates them per
    # aggregate — measured 3.0s vs 1.1s for the whole pass at sf0.1).
    # The projection is a narrow transform, so partition ids and scan
    # order are unchanged.
    #
    # sql_fast (optimization r12): the flag projection and the ~13
    # aggregates per column are built as SQL STRINGS shipped through ONE
    # selectExpr + per-aggregate F.expr instead of ~80 Column-op py4j
    # round trips per column — same expressions, same plan, construction
    # 0.96s -> 0.38s per 17-column import (tools/ab_infer_construction.py;
    # value parity asserted there and locked by
    # tests/test_sources_golden.py::test_infer_sql_fast_path_equivalence).
    # The ctrl-guard translate() over raw control chars and the
    # parity_double pandas UDF stay Column-built, so those rare paths
    # keep the certified constructor.
    # SPARK_GRAFT_INFER_SQL=0 is the rollback/A-B switch to the Column
    # constructor (tools/ab_infer_sql_fast.py flips it interleaved)
    sql_fast = (
        not ctrl_risk
        and float_parity is not True
        and os.environ.get("SPARK_GRAFT_INFER_SQL", "1") != "0"
    )
    if sql_fast:
        base = mask_stage.selectExpr(
            *_infer_flag_exprs(data_cols, check_bad_lines, float_parity,
                               py_engine)
        )
        aggs = [
            F.expr(s)
            for s in _infer_agg_exprs(data_cols, check_bad_lines)
        ]
    else:
        base, aggs = _infer_flag_agg_columns(
            mask_stage, data_cols, check_bad_lines, float_parity,
            py_engine, ctrl_risk,
        )
    if return_partition_counts:
        prows = (
            base.groupBy(F.spark_partition_id().alias("__pid__")).agg(*aggs).collect()
        )
        counts = {r["__pid__"]: r["__rows__"] for r in prows}

        def _combine(name):
            vals = [r[name] for r in prows]
            if name.endswith(
                ("_firstbig", "_firstfloat", "_firstnegf", "_firstposf",
                 "_firstu64", "_firstnegovf")
            ):
                nn = [v for v in vals if v is not None]
                return min(nn) if nn else None
            if name.endswith("_bits"):
                out = 0
                for v in vals:
                    out |= v or 0
                return out
            return sum(vals)

        row = (
            {name: _combine(name) for name in prows[0].asDict() if name != "__pid__"}
            if prows
            else {}
        )
    else:
        counts = None
        row = base.agg(*aggs).collect()[0].asDict()
    if check_bad_lines and row and row["__n_bad__"]:
        if source_cache is not None:
            source_cache.unpersist()
        raise LoadCsvError("Error tokenizing data: too many fields")
    if not row:  # empty file: keep all-string schema
        out = df.drop(_EXTRA, "__pos__")
        if return_partition_counts:
            out.__source_cache__ = source_cache
            return out, counts or {}, {}, {}, set()
        return out

    # '0e309'-class phase 2: zero-valued cells whose decimal exponent
    # exceeds 308 are ERANGE rejects in pandas (precise_xstrtod caps
    # significant digits at 17 BEFORE applying the exponent) though Spark
    # folds them to 0.0. Such cells are vanishingly rare, so the main
    # aggregate carries only the cheap contains('e') probe and this
    # column-pruned second aggregate pays the regex arithmetic when the
    # probe fired (reads the masked cache; no re-parse).
    zcands = [
        (i, c)
        for i, c in enumerate(data_cols)
        if ((row[f"c{i}_bits"] or 0) & 4) and row[f"c{i}_ovf"] == 0
    ]
    if zcands:
        aggs2 = []
        for i, c in zcands:
            zq = F.col(f"__m{i}")
            zd = zq.try_cast("double")
            ztrim = F.trim(zq)
            exp_lit = F.regexp_extract(
                ztrim, r"[eE]([+-]?[0-9]+)$", 1
            ).try_cast("long")
            int_digits = F.length(F.regexp_extract(ztrim, r"^[+-]?([0-9]*)", 1))
            frac_digits = F.length(
                F.regexp_extract(ztrim, r"^[+-]?[0-9]*\.([0-9]*)", 1)
            )
            pd_exp = (
                exp_lit
                + F.greatest(int_digits - 17, F.lit(0))
                - F.least(
                    frac_digits, F.greatest(F.lit(17) - int_digits, F.lit(0))
                )
            )
            aggs2.append(
                F.count(
                    F.when(
                        (zd == 0.0) & exp_lit.isNotNull() & (pd_exp > 308), 1
                    )
                ).alias(f"z{i}")
            )
        row2 = mask_stage.agg(*aggs2).collect()[0]
        for i, c in zcands:
            row[f"c{i}_ovf"] += row2[f"z{i}"]

    # bool detection for columns that are neither int nor float: the
    # candidacy count now rides the MAIN aggregate (c{i}_bool) — no
    # second scan (lineitem-shaped files made every text/date column
    # "undecided", so the deferred probe used to re-read the whole file)
    total_rows = row["__rows__"]
    undecided = [
        (i, c)
        for i, c in enumerate(data_cols)
        if row[f"c{i}_n"] > 0
        and row[f"c{i}_re"] < row[f"c{i}_n"]
        and row[f"c{i}_dbl"] < row[f"c{i}_n"]
    ]
    idx = {c: i for i, c in enumerate(data_cols)}
    bool_ok: dict[str, bool] = {}
    bool_first_null: dict[str, bool] = {}
    if undecided:
        for i, c in undecided:
            bool_ok[c] = row[f"c{i}_bool"] == row[f"c{i}_n"]
        # bool-with-NULL columns are object in pandas; the reference derives
        # the DDL from the FIRST row only (df[:1].to_sql, utils.py:305), so
        # affinity is INTEGER when row 1 holds a bool, TEXT when it is NULL
        with_null_bools = [
            c for i, c in undecided if bool_ok[c] and row[f"c{i}_n"] < total_rows
        ]
        if with_null_bools:
            first = (
                mask_stage.select(
                    *[F.col(f"__m{idx[c]}").alias(c) for c in with_null_bools]
                )
                .limit(1)
                .collect()
            )
            for c in with_null_bools:
                bool_first_null[c] = (not first) or first[0][c] is None

    kinds, overrides = _decide_types(
        data_cols, row, quoting, bool_ok, bool_first_null, float_parity,
        py_engine,
    )
    # AUTO parity phase 2: the main aggregate computed the C1
    # integrality (c_nonint) and subnormal counts from Spark's cast, but
    # risk-flagged float columns will store precise_xstrtod VALUES — and
    # the two can disagree exactly there (e.g. '0.000000000000000000001'
    # is 1e-21 to the cast but 0.0 to pandas, flipping the INTEGER
    # affinity). Recompute both counts from the parity parse for just
    # those columns (column-pruned read of the cached masked strings —
    # the zcands pattern), then re-decide. Clean files never pay this.
    if float_parity is None:
        pcols = [(idx[c], c) for c, k in kinds.items() if k == "pdouble"]
        if pcols:
            pstage = mask_stage.select(
                *[
                    parity_double(F.col(f"__m{i}")).alias(f"pv{i}")
                    for i, c in pcols
                ]
            )
            paggs = []
            for i, c in pcols:
                pv = F.col(f"pv{i}")
                paggs.append(
                    F.count(
                        F.when(
                            pv.isNotNull()
                            & ~F.isnan(pv)
                            & (
                                ((pv % F.lit(1.0)) != 0.0)
                                | (F.abs(pv) == float("inf"))
                            ),
                            1,
                        )
                    ).alias(f"pn{i}")
                )
                paggs.append(
                    F.count(
                        F.when(
                            (F.abs(pv) < 2.2250738585072014e-308)
                            & (pv != 0.0),
                            1,
                        )
                    ).alias(f"ps{i}")
                )
            prow = pstage.agg(*paggs).collect()[0]
            for i, c in pcols:
                row[f"c{i}_nonint"] = prow[f"pn{i}"]
                row[f"c{i}_subn"] = prow[f"ps{i}"]
            kinds, overrides = _decide_types(
                data_cols, row, quoting, bool_ok, bool_first_null,
                float_parity, py_engine,
            )
    # The typed projection normally reads the CACHED masked strings (one
    # tokenize + one mask pass total). Only when a rawtext column exists
    # (the uint64-conflict quirk) does it fall back to the RAW frame —
    # re-parsing the file once more but preserving NA tokens as literals;
    # the file-split scan layout is deterministic, so partition counts
    # from the cached pass still apply.
    has_raw = any(k == "rawtext" for k in kinds.values())
    src = df if has_raw else mask_stage
    projections = []
    for c in data_cols:
        q = m(c) if has_raw else F.col(f"__m{idx[c]}")
        kind = kinds[c]
        if kind == "allnull" or kind == "long":
            projections.append(q.try_cast("long").alias(c))
        elif kind == "longfloat":
            # pandas int64→float64 upcast: EXACT int values as doubles
            projections.append(q.try_cast("long").cast("double").alias(c))
        elif kind == "double":
            projections.append(q.try_cast("double").alias(c))
        elif kind == "pdouble":
            projections.append(parity_double(q).alias(c))
        elif kind == "bool":
            projections.append((F.lower(q) == "true").alias(c))
        elif kind == "rawtext":
            # uint64-conflict quirk: RAW strings, NA tokens kept literal
            projections.append(qcol(c))
        else:  # text
            projections.append(q.alias(c))
    typed = src.select(*projections)
    if return_partition_counts:
        # per-column non-null counts ride along from the same aggregate —
        # the engine needs "is this column ALL null" for extract DDL
        # parity without a second job; ditto the subnormal-presence set
        # that gates the exact-%g spill fallback
        nonnull = {c: row[f"c{i}_n"] for i, c in enumerate(data_cols)}
        subnormal = {c for i, c in enumerate(data_cols) if row[f"c{i}_subn"]}
        typed.__source_cache__ = source_cache  # engine unpersists post-spill
        return typed, counts, overrides, nonnull, subnormal
    return typed


def _add_item(filename: str, lookup: dict[str, str], path: str) -> None:
    """A10 dedup naming: base, base-1, base-2… (reference utils.py:61-75)."""
    name = os.path.splitext(os.path.basename(filename))[0]
    if name not in lookup:
        lookup[name] = path
        return
    suffix = 1
    while f"{name}-{suffix}" in lookup:
        suffix += 1
    lookup[f"{name}-{suffix}"] = path


def csvs_from_paths(paths) -> dict[str, str]:
    """A9-A12: ordered {table_name: path} (reference utils.py:58-90).

    Files: basename sans .csv with -N dedup. Directories: os.walk, names are
    relpath/basename (may contain '/', including leading './'); NOTE the
    reference does NOT dedup on the directory path (utils.py:88) — collisions
    silently overwrite, which we replicate for parity.
    """
    csvs: dict[str, str] = {}
    for path in paths:
        if _is_url(path):
            name = os.path.splitext(os.path.basename(urllib.parse.urlparse(path).path))[0]
            _add_item(name + ".csv", csvs, path)
        elif os.path.isfile(path):
            _add_item(path, csvs, path)
        elif os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for filename in files:
                    if fnmatch.fnmatch(filename, "*.csv"):
                        relpath = os.path.relpath(root, path)
                        namepath = os.path.join(relpath, os.path.splitext(filename)[0])
                        csvs[namepath] = os.path.join(root, filename)
        else:
            raise LoadCsvError(f"no such file or directory: {path}")
    return csvs
