INSERT INTO db.t_hist
SELECT s.vessel_id, CAST(2 AS BIGINT) AS run_id,
       to_json(named_struct('name', t.name, 'flag', t.flag)) AS old_values,
       CASE WHEN (s.is_deleted) THEN NULL ELSE to_json(named_struct('name', s.name, 'flag', s.flag)) END AS new_values,
       CASE WHEN (s.is_deleted) THEN 'DELETE' ELSE 'ATTRIBUTE_CHANGE' END AS change_type,
       current_timestamp() AS changed_at
FROM updates s JOIN db.t t ON t.vessel_id = s.vessel_id
WHERE (s.is_deleted) OR (NOT (t.name <=> s.name) OR NOT (t.flag <=> s.flag))
