INSERT INTO db.t_hist
SELECT s.id, CAST(1 AS BIGINT) AS run_id,
       to_json(named_struct('name', t.name)) AS old_values,
       to_json(named_struct('name', s.name)) AS new_values,
       'ATTRIBUTE_CHANGE' AS change_type,
       current_timestamp() AS changed_at
FROM updates s JOIN db.t t ON t.id = s.id
WHERE NOT (t.name <=> s.name)
