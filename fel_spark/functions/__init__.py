"""Column-level functions: text normalization, similarity, hashing.

Everything here is either a native Column expression (JVM-side, codegen'd)
or an Arrow-batched pandas UDF — never a row-at-a-time Python UDF.
"""

from fel_spark.functions.text import (  # noqa: F401
    char_bigrams,
    normalize_fast,
    normalize_tokens,
    token_ngrams,
)
from fel_spark.functions.sim import (  # noqa: F401
    array_jaccard,
    bigram_dice,
    cosine_sim,
    jaro_winkler_pudf,
)
from fel_spark.functions.hashing import (  # noqa: F401
    minhash_signature,
    uniform_hash,
)
