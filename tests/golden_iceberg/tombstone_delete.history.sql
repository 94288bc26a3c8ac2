INSERT INTO db.t_hist
SELECT s.vessel_id, CAST(2 AS BIGINT) AS run_id,
       to_json(named_struct('name', t.name, 'flag', t.flag)) AS old_values,
       to_json(named_struct('name', s.name, 'flag', s.flag)) AS new_values,
       'ATTRIBUTE_CHANGE' AS change_type,
       current_timestamp() AS changed_at
FROM updates s JOIN db.t t ON t.vessel_id = s.vessel_id
WHERE NOT (t.name <=> s.name) OR NOT (t.flag <=> s.flag)
