MERGE INTO db.t t USING updates s ON t.vessel_id = s.vessel_id
WHEN MATCHED AND (s.is_deleted) THEN DELETE
WHEN MATCHED AND (NOT (t.name <=> s.name) OR NOT (t.flag <=> s.flag)) THEN UPDATE SET t.name = s.name, t.flag = s.flag
WHEN NOT MATCHED THEN INSERT *
