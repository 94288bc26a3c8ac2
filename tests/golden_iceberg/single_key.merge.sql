MERGE INTO db.t t USING updates s ON t.id = s.id
WHEN MATCHED AND (NOT (t.name <=> s.name)) THEN UPDATE SET t.name = s.name
WHEN NOT MATCHED THEN INSERT *
