"""Structured Streaming machinery: the engine's replacement for the
reference's daily-cron full refresh (SURVEY.md §2.8 O3/O5)."""
