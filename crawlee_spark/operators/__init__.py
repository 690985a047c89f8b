"""Frontier / scheduling / enqueue / dedup operators (DataFrame transforms)."""
