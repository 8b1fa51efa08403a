from c3s_sm_spark.functions.codecs import (  # noqa: F401
    decode_ts,
    decode_vals,
    encode_ts,
    encode_vals,
    pack_series,
    unpack_series,
)
