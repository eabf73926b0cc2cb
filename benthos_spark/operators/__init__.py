"""Operators: the reference's processor/buffer inventory re-expressed as
``DataFrame -> DataFrame`` transforms (SURVEY.md §2.3/§2.4)."""
