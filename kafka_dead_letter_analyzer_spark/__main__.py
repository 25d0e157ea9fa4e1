"""``python -m kafka_dead_letter_analyzer_spark`` — the application entry
point (reference: DeadLetterAnalyzerApplication.main, SURVEY.md §3.1)."""

from kafka_dead_letter_analyzer_spark.cli import main

main()
