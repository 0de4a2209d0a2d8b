"""ANSI-SQL oracle twins for ``plans.queries`` (run by DuckDB).

Tables are pre-registered views named region nation customer supplier part
orders lineitem events documents embeddings. Every computed column is
aliased to the same name as the Spark side.
"""

ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity), 2)                                        AS avg_qty,
               round(avg(l_extendedprice), 2)                                   AS avg_price,
               round(avg(l_discount), 4)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "latest_order_per_customer": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice, o_orderstatus
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC
            ) AS rn
            FROM orders
        ) t WHERE rn = 1
    """,
    "customer_order_counts_having": """
        SELECT o_custkey, count(*) AS order_count
        FROM orders GROUP BY o_custkey HAVING count(*) > 1
    """,
    "dup_order_members": """
        SELECT o_custkey, count(*) AS order_count,
               string_agg(CAST(o_orderkey AS VARCHAR), ','
                          ORDER BY CAST(o_orderkey AS VARCHAR)) AS member_keys
        FROM orders GROUP BY o_custkey HAVING count(*) > 1
    """,
    "revenue_by_region": """
        SELECT r_name, round(sum(o_totalprice), 2) AS total_revenue,
               count(*) AS order_count
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "customers_with_orders_semi": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "order_status_distribution": """
        SELECT o_orderstatus, count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "conditional_counts": """
        SELECT count(*) AS total_orders,
               count(*) FILTER (WHERE o_orderstatus = 'F')        AS finished_orders,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_orders,
               count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '2000-01-01') AS recent_orders,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders
    """,
    "top3_orders_per_customer": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
            ) AS rk
            FROM orders
        ) t WHERE rk <= 3
    """,
    "null_counts_events": """
        SELECT count(*) FILTER (WHERE user_id IS NULL) AS user_id_nulls,
               count(*) FILTER (WHERE value IS NULL)   AS value_nulls,
               count(*) FILTER (WHERE props IS NULL)   AS props_nulls,
               count(*) AS total_rows
        FROM events
    """,
    "events_hourly_stats": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2
    """,
    "global_top100_orders": """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > DATE '1996-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    "order_point_lookup": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice
        FROM orders WHERE o_orderkey = 42
    """,
    "masked_customer_emails": """
        SELECT c_custkey, substr(c_name, 1, 3) || '***' AS masked_name
        FROM customer
    """,
}
