"""Inverted index: posting-list codec (delta + varint, block-max stats),
partition-checkpointed build with salted hot-term merge, and Block-Max
WAND query-time pruning."""
