"""Declared StructTypes.

The reference ingests nested JSON with NO declared schema (it trusts
``response.json()``, reference ``FunctionApp1/hotel_reviews/__init__.py:37``).
The engine declares schemas explicitly and parses in PERMISSIVE mode
with a corrupt-record column — at 100 TB schema inference is both a
correctness hazard (ragged optional fields like
``hotelier_response_date``) and an extra full pass over the data.

Field inventory derives from the reference's ``sample.json`` payload
(25 real records) as documented in FIXTURES.md A1/A2.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference payload (FIXTURES.md A2; sample.json) -----------------

PHOTO = T.StructType(
    [
        T.StructField("ratio", T.DoubleType()),
        T.StructField("photo_id", T.LongType()),
        T.StructField("url_original", T.StringType()),
        T.StructField("url_square60", T.StringType()),
        T.StructField("url_max300", T.StringType()),
        T.StructField("url_640x200", T.StringType()),
    ]
)

AUTHOR = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("age_group", T.StringType()),
        T.StructField("countrycode", T.StringType()),
        T.StructField("type_string", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("helpful_vote_count", T.IntegerType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("nr_reviews", T.IntegerType()),
    ]
)

STAYED_ROOM_INFO = T.StructType(
    [
        T.StructField("room_id", T.LongType()),
        T.StructField("room_name", T.StringType()),
        T.StructField("checkin", T.StringType()),  # 'YYYY-MM-DD' -> DATE at silver
        T.StructField("checkout", T.StringType()),
        T.StructField("num_nights", T.IntegerType()),
        T.StructField("photo", PHOTO),
    ]
)

REVIEW = T.StructType(
    [
        T.StructField("review_id", T.LongType()),
        T.StructField("review_hash", T.StringType()),  # dedup key
        T.StructField("hotel_id", T.LongType()),
        T.StructField("hotelier_name", T.StringType()),
        T.StructField("hotelier_response", T.StringType()),
        # OPTIONAL epoch-seconds field: present on only some records (ragged)
        T.StructField("hotelier_response_date", T.LongType()),
        T.StructField("average_score", T.DoubleType()),
        T.StructField("title", T.StringType()),
        T.StructField("title_translated", T.StringType()),
        T.StructField("pros", T.StringType()),  # main sentiment input
        T.StructField("pros_translated", T.StringType()),
        T.StructField("cons", T.StringType()),
        T.StructField("cons_translated", T.StringType()),
        T.StructField("date", T.StringType()),  # 'YYYY-MM-DD HH:MM:SS'
        T.StructField("travel_purpose", T.StringType()),
        T.StructField("languagecode", T.StringType()),
        T.StructField("countrycode", T.StringType()),
        T.StructField("helpful_vote_count", T.IntegerType()),
        T.StructField("anonymous", T.StringType()),
        # boolean-as-int flags (cast to BOOLEAN at silver)
        T.StructField("is_trivial", T.IntegerType()),
        T.StructField("is_moderated", T.IntegerType()),
        T.StructField("is_incentivised", T.IntegerType()),
        T.StructField("reviewng", T.IntegerType()),
        T.StructField("author", AUTHOR),
        T.StructField("stayed_room_info", STAYED_ROOM_INFO),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("user_new_badges", T.ArrayType(T.StringType())),
        T.StructField("reviewer_photos", T.ArrayType(T.StringType())),
    ]
)

# Envelope: {count, result: [review...], sort_options}
REVIEWS_PAYLOAD = T.StructType(
    [
        T.StructField("count", T.IntegerType()),
        T.StructField("result", T.ArrayType(REVIEW)),
        T.StructField("sort_options", T.ArrayType(T.StringType())),
        # PERMISSIVE-mode capture of malformed records
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# --- pipeline tables (FIXTURES.md A3-A6) -----------------------------

SOURCE_TABLE = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("text_column", T.StringType()),
        T.StructField("processed", T.IntegerType(), False),  # 0/1 flag
    ]
)

SENTIMENT_DOCUMENT = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # str(SourceTable.id)
        T.StructField("language", T.StringType(), False),  # hardcoded 'en'
        T.StructField("text", T.StringType()),
    ]
)

CONFIDENCE_SCORES = T.StructType(
    [
        T.StructField("positive", T.DoubleType(), False),
        T.StructField("neutral", T.DoubleType(), False),
        T.StructField("negative", T.DoubleType(), False),
    ]
)

SENTIMENT_RESPONSE = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("sentiment", T.StringType(), False),
        T.StructField("confidenceScores", CONFIDENCE_SCORES, False),
    ]
)

SENTIMENT_RESULTS = T.StructType(
    [
        T.StructField("record_id", T.StringType(), False),
        T.StructField("sentiment", T.StringType(), False),
        # reference keeps only confidenceScores.positive
        T.StructField("confidence", T.DoubleType(), False),
    ]
)
