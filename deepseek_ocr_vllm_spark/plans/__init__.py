"""Query plans: the SURVEY.md §2 operator inventory expressed as
DataFrame plans with DuckDB oracle SQL for the driver's correctness gate."""
