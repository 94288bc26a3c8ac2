INSERT INTO db.t_hist
SELECT s.vessel_id, s.voyage_id, CAST(7 AS BIGINT) AS run_id,
       to_json(named_struct('name', t.name, 'flag', t.flag, 'tonnage', t.tonnage)) AS old_values,
       to_json(named_struct('name', s.name, 'flag', s.flag, 'tonnage', s.tonnage)) AS new_values,
       'ATTRIBUTE_CHANGE' AS change_type,
       current_timestamp() AS changed_at
FROM updates s JOIN db.t t ON t.vessel_id = s.vessel_id AND t.voyage_id = s.voyage_id
WHERE NOT (t.name <=> s.name) OR NOT (t.flag <=> s.flag) OR NOT (t.tonnage <=> s.tonnage)
