MERGE INTO db.t t USING outbox s ON t.event_id = s.event_id
WHEN NOT MATCHED THEN INSERT *
