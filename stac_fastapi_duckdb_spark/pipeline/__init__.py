"""Large-scale training-data pipeline operators (beyond-reference,
SURVEY §7.4): deduplication, similarity search, text analysis,
multimodal plumbing. All designed for the 100 TB path: shuffles only on
banded/bucketed keys, no driver-side loops, Python only in Arrow-batched
UDFs."""
