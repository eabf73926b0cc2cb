"""Sinks — the reference's output layer (SURVEY.md §2.2) on Spark.

The headline sink upgrades the reference's at-least-once transaction
model (/root/reference/README.md:34-36, internal/message/transaction.go)
to exactly-once via idempotent ``foreachBatch`` commits.
"""
