"""Structured Streaming surface (SURVEY.md §2.I [EXT]).

The reference's entire streaming story is a one-shot snapshot reload
(ksql.js:280 setTimeout + ksql.js:249-255 load); jobs.py provides the real
thing: file-replayed event streams, watermarked tumbling/session windows,
streaming dedup, arbitrary stateful ops, and a foreachBatch snapshot-refresh
that emulates the reference's reload loop.
"""
