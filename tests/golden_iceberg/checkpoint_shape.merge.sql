MERGE INTO db.t t USING new_turns s ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
WHEN MATCHED AND (NOT (t.clean_text <=> s.clean_text) OR NOT (t.n_spans <=> s.n_spans)) THEN UPDATE SET t.clean_text = s.clean_text, t.n_spans = s.n_spans
WHEN NOT MATCHED THEN INSERT *
