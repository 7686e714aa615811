"""Source connectors (SURVEY §2 S1–S2).

Network fetch is pluggable; the engine ships a deterministic fixture
generator (``youtube.py``) shaped exactly like the YouTube Data API v3
``channels().list`` response, plus generic file readers.
"""
