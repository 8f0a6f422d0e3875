package com.google.gson;

import java.util.LinkedHashMap;
import java.util.Map;
import java.util.Set;
import java.util.StringJoiner;

public class JsonObject extends JsonElement {
    private final LinkedHashMap<String, JsonElement> members = new LinkedHashMap<>();

    public void add(String name, JsonElement value) {
        members.put(name, value);
    }

    public void addProperty(String name, String value) {
        members.put(name, new JsonPrimitive(value));
    }

    public void addProperty(String name, Number value) {
        members.put(name, new JsonPrimitive(value));
    }

    public JsonArray getAsJsonArray(String name) {
        return (JsonArray) members.get(name);
    }

    public JsonElement get(String name) {
        return members.get(name);
    }

    public Set<Map.Entry<String, JsonElement>> entrySet() {
        return members.entrySet();
    }

    @Override
    public long getAsLong() {
        throw new UnsupportedOperationException();
    }

    @Override
    public String getAsString() {
        throw new UnsupportedOperationException();
    }

    @Override
    public String toString() {
        StringJoiner j = new StringJoiner(",", "{", "}");
        for (Map.Entry<String, JsonElement> e : members.entrySet()) {
            j.add(new JsonPrimitive(e.getKey()).toString() + ":" + e.getValue().toString());
        }
        return j.toString();
    }
}
