MERGE INTO db.t t USING updates s ON t.vessel_id = s.vessel_id AND t.voyage_id = s.voyage_id
WHEN MATCHED AND (NOT (t.name <=> s.name) OR NOT (t.flag <=> s.flag) OR NOT (t.tonnage <=> s.tonnage)) THEN UPDATE SET t.name = s.name, t.flag = s.flag, t.tonnage = s.tonnage
WHEN NOT MATCHED THEN INSERT *
