"""Certification ledger for the external correctness driver.

Each entry maps a registered query name to (round_certified,
spec_fingerprint) where the fingerprint is md5(oracle_sql +
inspect.getsource(registered_fn)) captured at certification time
(the source segment includes the @q decorator, so oracle and doc
changes move it too). The export ordering in registry._ordered()
treats a query as certified only while its CURRENT fingerprint
equals the recorded one, so any change to a query automatically
evicts it back into the front of the verification window (round-2
ADVICE). Certified entries export oldest-round-first so
re-certification rotates through the least-recently-checked block.

Excluded on purpose (must re-verify in round 3): sessionize_events
(hash mismatch in r02), dedup_simhash + window_range_frame (modified
in r02 after their r01 certificates), and the round-3 edits
(decimal-sum oracles, adaptive grid sizing, vectorized LSH buckets,
in-plan tfidf N, NOT EXISTS incremental-dedup oracle).
"""

CERTIFIED: dict[str, tuple[int, str]] = {
    "agg_approx_distinct": (2, "204789133b041b8d29d33356c462b44c"),
    "agg_cube": (2, "78793ac6e0d32a7a0847eb7a4f358c45"),
    "agg_distinct": (2, "81494b378418b09dcad40298168d31e8"),
    "agg_grouping_sets": (2, "0762a8cd1266c521c3222ab40c472491"),
    "agg_percentile": (2, "b769a6e419088639d5893e7367f55d8b"),
    "agg_price_stats": (2, "b90d2c57e58b1501fdcb9503bf67eec9"),
    "agg_rollup": (2, "066840bad8eb46ec69c2facfa0f9da61"),
    "agg_sketch_rollup": (2, "64d8b488fb289d81d44697f3cf674011"),
    "agg_stats": (2, "3a4e2ce60c1f60b40f0c0a7d3d2def7b"),
    "anti_join_invalid": (1, "62cdda70769639485d5c1ef6e54ac174"),
    "asof_price_change": (1, "7eb413487adbc87f9d901fc502402438"),
    "corpus_funnel": (2, "adc797f42fe21a51211842fcc835196a"),
    "corpus_mix": (2, "dbaaeb6ab84b8120acccb7ce032bacf0"),
    "decontaminate": (2, "115e839f63d439f3c7e1a523c0ea0a7b"),
    "dedup_clusters": (2, "7a4c1ad3275b2b8acf60e8e5050d24bc"),
    "dedup_editdist": (2, "e9e5fac2c206f805eff353b8dcbaaff9"),
    "dedup_exact": (1, "4be5d7579611014b3c481bcc5ede1285"),
    "dedup_near": (1, "3c25dcf8ef3bc47b5d6f46c829589550"),
    "dedup_ngram": (1, "224a891a67502af61abc376362e50f44"),
    "dedup_ngram_prefix": (2, "72a8579e48d612150d14e4bac81dca38"),
    "doc_fingerprint": (2, "5e164a33ec318011852d82a3b30a2e99"),
    "filter_empty_pages": (2, "2a4302c387abc2a51466d33baf4139ec"),
    "fn_array_ops": (1, "2540911dc08b769449af4cedea6fa097"),
    "fn_date_format": (1, "0e7d9e373aaad172799f2018d4b0c056"),
    "fn_discount_check": (1, "7e02ca6c90ec80f2df4298f557d46ddf"),
    "fn_explode_links": (1, "9e64c65067f4dd7f28270b951f2edc17"),
    "fn_json_props": (1, "1c17ae38b296de65dbb94c04f7708c31"),
    "fn_parse_percent": (1, "ede1ee09a8889f96843e3f1b99cd9d5b"),
    "fn_parse_rupiah": (1, "baaa56e84f70bb8313f66a1f7115767e"),
    "fn_udtf_links": (1, "e8f6a62eab26f8c77bc7db914dce05b3"),
    "join_broadcast": (1, "faed66a378819557d94a4a05f590fae3"),
    "join_cross": (2, "889bb56126cd94dbc7cdf3eeb92fd370"),
    "join_full_outer": (1, "0653e97c1f8cb7027498ff0e3502f612"),
    "join_inner": (1, "31dff6a3cdbfcc50eeaf7d9a2b9aff8c"),
    "join_outer": (1, "eab39ba1f1e598a8ce6cf74273634444"),
    "join_range": (1, "40c1ea299598c720b3bb9735ac4cd168"),
    "join_salted": (1, "4e14045ce6bc27b64feb1ea7133a8398"),
    "join_semi": (1, "92bec83d9c4b56b6e1a70f07c84a33e3"),
    "lang_id": (2, "94d41359a9b612ec02e4b50863ca7138"),
    "last_valid_page": (2, "5944da5cfb72e0ba6f09fdb56c117df6"),
    "multimodal_decode": (2, "8c7f01b51254d5185a14322c4b1bea5e"),
    "multimodal_meta": (2, "ca4173d5276fed902cb3f7afe2338fcc"),
    "page_sequence": (2, "0cb368a0a05fa095462c68c55856b35a"),
    "parse_product": (1, "dda196f0f8d5739b923879b23ae45010"),
    "pivot_event_types": (2, "b726d9fefb7ca141592d72e3fb9a8373"),
    "project_links": (2, "6c9ede859da6ab508ca8eaafdca7106e"),
    "quality_filter_percentile": (2, "883b8404072061ecd93b87309aa48d87"),
    "quarantine_stats": (2, "a3c44347e9e1c6a42c26584d7044fe32"),
    "scrape_pipeline": (2, "27cf6bb9db1dfe417a619229985de67d"),
    "set_churn": (1, "a421fcba14c1624b56e0fa3dcce7d420"),
    "set_intersect_except": (1, "aeaa7d273a0505117582abca8f561886"),
    "sim_ann_ivf": (2, "cdfc8f09223b96eb83f097be996d0eee"),
    "sim_range_search": (2, "321d56594a8af53cfa109528d770cc06"),
    "sim_topk": (2, "2c1752055005d0486666a2e671890e1d"),
    "sort_limit": (1, "2a8b7ce0ed02b57c24ec53285e6a4b08"),
    "split_train_test": (2, "5c99285d21b42e2f310d4ab61eab74ff"),
    "sql_revenue_topn": (2, "9e8fbdb9de2b5ad20a01afffe8558e9d"),
    "stream_dedup": (2, "c126ff06100f67c634535c8b79330d3b"),
    "stream_join": (1, "2251275b7e1173a7746a29f5ca01c0de"),
    "stream_session": (1, "b2f562b512a7c175115711758d80a459"),
    "stream_sliding": (1, "a7739dcd7edafd5e312ef721d00d0b33"),
    "stream_watermark": (1, "a3b8cec2695c6c84e1e994b1546454e3"),
    "text_normalize": (2, "0da3a71b9474688f1829f20ed11d9549"),
    "text_quality": (2, "c3eb625624eeeddcd43135ca6c4fd6de"),
    "text_redact": (2, "30cf763df9061eeb523dc681e7b6c8ce"),
    "text_repetition": (2, "e571265916ed72ccc09ffa529fd20bc6"),
    "text_stats": (2, "6fd06bd7fb0f25f0bda4d894875ab19b"),
    "text_tokens": (2, "de57180ed4120056601cc822db4647fe"),
    "topk_per_group": (1, "5890940891bf9bc47081d5ea489f27d7"),
    "udaf_weighted_avg": (2, "5c009ec8996bae8db3b7affc015c39fe"),
    "union_shops": (1, "d19657703d30861942dc5c0ac1d48fc2"),
    "valid_count": (2, "c39fea462547f75dc30a76fe93271b62"),
    "window_distribution": (1, "4c60dd64d8def1eb483183b9a1b2bec6"),
    "window_first_last": (2, "7c50adb12eb2b8c556ebf264647388d2"),
    "window_lag_price": (1, "4384bb074ea67d1df0e475ba14e0f23c"),
    "window_moving_avg": (1, "077c86d2983e16e52264caa7f8b035cb"),
    "window_rank": (1, "a89c8e7f560dc386464f68ce89e72662"),
}
