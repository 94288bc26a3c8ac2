INSERT INTO db.t_hist
SELECT s.conv_id, s.turn_idx, CAST(3 AS BIGINT) AS run_id,
       to_json(named_struct('clean_text', t.clean_text, 'n_spans', t.n_spans)) AS old_values,
       to_json(named_struct('clean_text', s.clean_text, 'n_spans', s.n_spans)) AS new_values,
       'ATTRIBUTE_CHANGE' AS change_type,
       current_timestamp() AS changed_at
FROM new_turns s JOIN db.t t ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
WHERE NOT (t.clean_text <=> s.clean_text) OR NOT (t.n_spans <=> s.n_spans)
