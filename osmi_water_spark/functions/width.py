"""P6/P7 — width-tag parsing with unit conversion, as a vectorized pandas UDF.

Matches /root/reference/src/datastorage.hpp:143-201 semantically, including
its quirks:

* a ',' decimal separator is fixed up (first comma -> '.') but flags
  ``width_error`` (datastorage.hpp:151-155);
* a completely unparseable string yields width = -1 and **no** error flag
  (datastorage.hpp:160-161 sets width only — the error flag is untouched);
* unit suffixes (after optional whitespace): m (case-insensitive, no-op),
  km (x1000), mi (x1609.344), nmi (x1852), a lone ' (feet), a lone " (inch),
  and the X'Y" feet-inches combo; any other residue -> width=-1 + error;
* the reference computes in C ``float`` (32-bit) with the C promotion rules;
  we reproduce that with numpy float32 (the float value is internal only —
  the reference never writes the width column, quirk SURVEY.md §7.6.2).

Null input -> (0.0, false) (datastorage.hpp:144-147).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# strtof prefix: optional whitespace, optional sign, digits with optional
# decimal point (or leading point), optional exponent.
_NUM_RE = r"^([\s]*[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)(.*)$"
# feet-inches inner number (strtof again: may have ws + sign)
_INCH_RE = r"^([\s]*[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)(.*)$"

_WIDTH_SCHEMA = T.StructType(
    [
        T.StructField("width", T.FloatType(), True),
        T.StructField("width_error", T.BooleanType(), True),
    ]
)


def parse_width_batch(s: pd.Series) -> pd.DataFrame:
    """Vectorized width parse of a string Series -> DataFrame(width, width_error)."""
    n = len(s)
    width = np.zeros(n, dtype=np.float32)
    error = np.zeros(n, dtype=bool)
    isnull = s.isna().to_numpy()
    vals = s.fillna("")

    # comma fix-up (first comma only) flags an error
    has_comma = vals.str.contains(",", regex=False).to_numpy() & ~isnull
    fixed = vals.str.replace(",", ".", n=1, regex=False)
    error |= has_comma

    ext = fixed.str.extract(_NUM_RE, expand=True)
    numpart, rest = ext[0], ext[1]
    no_num = numpart.isna().to_numpy() & ~isnull
    width[no_num] = -1.0  # strtof consumed nothing: width=-1, error untouched

    parsed = ~numpart.isna().to_numpy() & ~isnull
    if parsed.any():
        width[parsed] = numpart[parsed].astype(np.float64).astype(np.float32)
        rest_stripped = rest.fillna("").str.lstrip()
        low = rest_stripped.str.lower()

        # done only when *endptr == '\0' BEFORE whitespace skipping: a
        # residue of pure whitespace ('5 ') enters the unit branch, matches
        # no unit, and falls to the else -> width=-1 + error
        # (datastorage.hpp:160-187; strcasecmp("", "m") != 0).
        done = ~parsed | (rest.fillna("") == "").to_numpy()
        m_m = parsed & (low == "m").to_numpy()
        m_km = parsed & (low == "km").to_numpy()
        m_mi = parsed & (low == "mi").to_numpy()
        m_nmi = parsed & (low == "nmi").to_numpy()
        m_ft = parsed & (rest_stripped == "'").to_numpy()
        m_in = parsed & (rest_stripped == '"').to_numpy()
        # C arithmetic: int literals multiply in float32, double literals
        # promote to float64 then narrow back (datastorage.hpp:165-180).
        width[m_km] = width[m_km] * np.float32(1000)
        width[m_mi] = (width[m_mi].astype(np.float64) * 1609.344).astype(np.float32)
        width[m_nmi] = width[m_nmi] * np.float32(1852)
        width[m_ft] = (width[m_ft].astype(np.float64) * 12.0 * 0.0254).astype(np.float32)
        width[m_in] = (width[m_in].astype(np.float64) * 0.0254).astype(np.float32)

        handled = done | m_m | m_km | m_mi | m_nmi | m_ft | m_in
        # X'Y" feet-inches path (datastorage.hpp:175-184)
        m_combo = parsed & ~handled & rest_stripped.str.startswith("'").to_numpy()
        if m_combo.any():
            after = rest_stripped[m_combo].str[1:]
            iext = after.str.extract(_INCH_RE, expand=True)
            inum, irest = iext[0], iext[1]
            ok = (~inum.isna() & (irest == '"')).to_numpy()
            idx = np.flatnonzero(m_combo)
            good, bad = idx[ok], idx[~ok]
            if good.size:
                inch = inum[ok].astype(np.float64).to_numpy()
                w = width[good].astype(np.float64)
                width[good] = ((w * 12 + inch) * 0.0254).astype(np.float32)
            width[bad] = -1.0
            error[bad] = True
        unknown = parsed & ~handled & ~m_combo
        width[unknown] = -1.0
        error[unknown] = True

    return pd.DataFrame({"width": width, "width_error": error})


@pandas_udf(_WIDTH_SCHEMA)
def parse_width(s: pd.Series) -> pd.DataFrame:
    return parse_width_batch(s)


def width_struct(width_tag: Column) -> Column:
    """Column helper: tags width string -> struct(width float, width_error bool)."""
    return parse_width(width_tag)


def width2string(width: float) -> str:
    """P7 — datastorage.hpp:193-201. Dead code in the reference (width is
    never written) but kept for parity tests: round(w*10), zero-pad to 2,
    re-insert the decimal point before the last digit."""
    x = float(width) * 10
    # C round() is half-away-from-zero (Python's round is banker's)
    rounded = int(np.floor(x + 0.5)) if x >= 0 else int(np.ceil(x - 0.5))
    s = str(rounded)
    if len(s) == 1:
        s = "0" + s
    return s[:-1] + "." + s[-1]


def width2string_col(width: Column) -> Column:
    """Expression version of width2string (JVM-side)."""
    rounded = F.round(width.cast("double") * 10).cast("long").cast("string")
    padded = F.when(F.length(rounded) == 1, F.concat(F.lit("0"), rounded)).otherwise(rounded)
    return F.concat(
        F.substring(padded, 1, F.length(padded) - 1).cast("string"),
        F.lit("."),
        F.substring(padded, -1, 1),
    )
