package com.google.gson;

public class JsonPrimitive extends JsonElement {
    private final Object value;

    public JsonPrimitive(Number v) {
        this.value = v;
    }

    public JsonPrimitive(String v) {
        this.value = v;
    }

    public JsonPrimitive(Boolean v) {
        this.value = v;
    }

    @Override
    public long getAsLong() {
        if (value instanceof Number) return ((Number) value).longValue();
        return Long.parseLong(value.toString());
    }

    @Override
    public String getAsString() {
        return value.toString();
    }

    @Override
    public String toString() {
        if (value instanceof String) {
            return "\"" + ((String) value).replace("\\", "\\\\").replace("\"", "\\\"") + "\"";
        }
        return value.toString();
    }
}
